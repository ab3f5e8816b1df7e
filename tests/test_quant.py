"""Int8 serving quantization (ops/quant.py).

Scope contract: only WIDE SPATIAL ungrouped convs (kernel > 1,
in_ch >= min_in_ch) are swapped — the subset tools/int8_micro.py
measured profitable on v5e.  Quantization is an opt-in accuracy trade,
so these tests pin (a) the eligibility rule, (b) the error bounds of
the scheme, and (c) that the swapped conv is numerically faithful."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.models.layers import Conv
from cvpr2021_vspw_implement_tpu.ops.quant import (
    dynamic_quantize, int8_trunk, quantize_per_channel)

RNG = np.random.default_rng(0)


def test_weight_quant_roundtrip_bound():
    k = jnp.asarray(RNG.standard_normal((3, 3, 64, 32)), jnp.float32)
    kq, s = quantize_per_channel(k)
    assert kq.dtype == jnp.int8 and s.shape == (32,)
    err = np.abs(np.asarray(k) - np.asarray(kq).astype(np.float32) * np.asarray(s))
    # round-to-nearest: error <= scale/2 per channel
    assert (err <= np.asarray(s)[None, None, None, :] * 0.5 + 1e-7).all()


def test_dynamic_quant_roundtrip_bound():
    x = jnp.asarray(RNG.standard_normal((2, 8, 8, 16)) * 3.0, jnp.float32)
    xq, sx = dynamic_quantize(x)
    assert xq.dtype == jnp.int8
    err = np.abs(np.asarray(x) - np.asarray(xq).astype(np.float32) * float(sx))
    assert (err <= float(sx) * 0.5 + 1e-7).all()


class _Mix(nn.Module):
    """One conv per eligibility branch."""

    @nn.compact
    def __call__(self, x):
        a = Conv(64, 3, 1, padding=2, dilation=2, use_bias=False,
                 name="wide_spatial")(x)           # in 256: eligible
        b = Conv(64, 1, 1, use_bias=False, name="wide_pointwise")(x)  # 1x1: no
        c = Conv(64, 3, 1, padding=1, use_bias=False,
                 name="thin_spatial")(a)           # in 64: no
        g = Conv(64, 3, 1, padding=1, groups=2, use_bias=False,
                 name="grouped")(x)                # grouped: no
        return a + b + c + g


def test_eligibility_rule():
    m = _Mix()
    x = jnp.asarray(RNG.standard_normal((1, 10, 12, 256)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    cnt = []
    with int8_trunk(min_in_ch=256, counter=cnt):
        m.apply(v, x)
    assert cnt == ["wide_spatial/conv"], cnt


def test_init_under_context_is_safe():
    m = _Mix()
    x = jnp.asarray(RNG.standard_normal((1, 10, 12, 256)), jnp.float32)
    with int8_trunk(min_in_ch=256):
        v = m.init(jax.random.PRNGKey(0), x)
    assert "params" in v


@pytest.mark.parametrize("dilation,stride,bias", [(2, 1, False), (1, 2, True)])
def test_quantized_conv_matches_f32(dilation, stride, bias):
    """The swapped conv equals the f32 conv to the error the scheme
    predicts: per-tap products err by <= (sx*|k| + sw|x| + sx*sw)/2 —
    on N(0,1) data that lands well under 2% of the output range."""
    pad = dilation
    m = Conv(96, 3, stride, padding=pad, dilation=dilation, use_bias=bias,
             name="c")
    x = jnp.asarray(RNG.standard_normal((1, 14, 17, 256)), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x)
    ref = m.apply(v, x)
    cnt = []
    with int8_trunk(min_in_ch=256, counter=cnt):
        q = m.apply(v, x)
    assert cnt == ["conv"]
    assert q.shape == ref.shape and q.dtype == ref.dtype
    rel = float(jnp.max(jnp.abs(q - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.02, rel


def test_int8_composes_with_width_bucketing():
    """Bucketed-masked int8 == exact-shape int8 on the valid region:
    zero pads quantize to zero and max|x| ignores zeros, so the
    masked-eval exactness argument survives quantization (the quantized
    s32 convs are exact integer arithmetic; the residual 1e-6-scale noise
    comes from the UNquantized f32 convs' padded-grid tiling, identical
    to the pure-masked trunk test's tolerance).  Also
    guards the interceptor-ordering hazard — int8 is the OUTER context
    and flax runs outer interceptors first, so the int8 path must honor
    ``current_mask()`` itself rather than rely on the inner mask
    interceptor it short-circuits."""
    import flax  # noqa: F401

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.ops.masked import (feature_valid,
                                                        masked_trunk)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    h, w = 64, 96
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    with int8_trunk():
        want = enc.apply(variables, img, train=False)[-1]

    pad_hw = (96, 128)
    imgp = jnp.pad(img, ((0, 0), (0, pad_hw[0] - h), (0, pad_hw[1] - w),
                         (0, 0)))
    cnt = []
    with int8_trunk(counter=cnt), masked_trunk((h, w), pad_hw):
        gotp = enc.apply(variables, imgp, train=False)[-1]
    assert len(cnt) > 0  # the quantized path actually ran under the mask
    hf, wf = gotp.shape[1:3]
    hv, wv = (int(v) for v in feature_valid(hf, wf, (h, w), pad_hw))
    assert (hv, wv) == tuple(want.shape[1:3])
    np.testing.assert_allclose(np.asarray(gotp[:, :hv, :wv]),
                               np.asarray(want), atol=1e-4, rtol=1e-4)


def test_serve_dtype_int8_eval_driver(tmp_path):
    """--serve_dtype int8 drives the streaming eval end to end and lands
    near the bf16 run (same synthetic video, random weights — the masks
    may differ at near-tie pixels, the metric must stay in range)."""
    import argparse

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    root = tmp_path / "vspw"
    make_synthetic_vspw(str(root), num_videos=1, frames_per_video=6,
                        size=(40, 48), num_class=5, seed=3)
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 512
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    args = argparse.Namespace(
        dataroot=str(root), num_class=5, method="clip_psp", clip_num=4,
        dilation_num=0, dilation2="1,2,3", lesslabel=False, split="val",
        load="", is_save=False, vc_clip_num=4, psp_weight=False,
        use_memory=False, memory_num=8, clipocr_all=False,
        deepsup_scale=0.4, st_weight=0.1, allsup=False, allsup_scale=0.3,
        linear_combine=False, distsoftmax=False, distnearest=False,
        temp=3.0, max_distances=[10], serve_dtype="int8",
        saveroot=str(tmp_path / "out"))
    metrics, _ = evaluate_clip(cfg, args, max_videos=1)
    assert 0.0 <= metrics["mIoU"] <= 1.0


def test_encoder_end_to_end_drift_bounded():
    """R18-dilated trunk (layer3/4 have in>=256 spatial convs): the
    composed drift through all quantized convs stays small relative to
    the feature scale."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    enc = ModelBuilder.build_encoder("resnet18dilated")
    x = jnp.asarray(RNG.standard_normal((1, 64, 96, 3)), jnp.float32)
    v = enc.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = enc.apply(v, x, train=False)[-1]
    cnt = []
    with int8_trunk(min_in_ch=256, counter=cnt):
        q = enc.apply(v, x, train=False)[-1]
    assert len(cnt) > 0  # layer3/layer4 3x3s actually swapped
    rel = float(jnp.max(jnp.abs(q - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.1, rel
