"""Width-bucketed masked eval == exact unpadded eval.

SURVEY §7 hard-part 4 / VERDICT r2 item 2: VSPW-480p val is 480 x
variable-width, so eval must compile O(buckets), not O(distinct widths),
with bit-identical predictions.  These tests prove the op-level building
blocks and the end-to-end model paths on synthetic multi-width inputs,
and assert the compile count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.ops import interpolate, pooling
from cvpr2021_vspw_implement_tpu.ops.masked import (
    adaptive_avg_pool2d_rt, bucket_size, feature_valid, global_avg_pool_rt,
    mask_interceptor, mask_valid, pad_to, resize_bilinear_rt)


@pytest.mark.parametrize("in_hw,out_hw,ac", [
    ((30, 53), (60, 106), False),
    ((30, 53), (60, 106), True),
    ((17, 29), (480, 853), False),
    ((64, 96), (17, 23), False),   # downsample
    ((1, 7), (8, 15), False),      # degenerate in_size=1 rows
])
def test_resize_rt_matches_static(in_hw, out_hw, ac):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 5)).astype(np.float32)
    want = interpolate.resize_bilinear(jnp.asarray(x), out_hw,
                                       align_corners=ac)
    in_pad = (bucket_size(in_hw[0], 8), bucket_size(in_hw[1], 8))
    out_pad = (bucket_size(out_hw[0], 8), bucket_size(out_hw[1], 8))
    xp = pad_to(jnp.asarray(x), in_pad)
    got = resize_bilinear_rt(xp, out_pad, in_hw, out_hw, align_corners=ac)
    got = got[:, :out_hw[0], :out_hw[1]]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    # padded region is exactly zero
    full = resize_bilinear_rt(xp, out_pad, in_hw, out_hw, align_corners=ac)
    assert float(jnp.abs(full[:, out_hw[0]:]).max(initial=0.0)) == 0.0
    assert float(jnp.abs(full[:, :, out_hw[1]:]).max(initial=0.0)) == 0.0


@pytest.mark.parametrize("in_hw,scale", [((60, 107), 1), ((60, 107), 2),
                                         ((60, 107), 6), ((13, 21), 3)])
def test_adaptive_pool_rt_matches_static(in_hw, scale):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *in_hw, 7)).astype(np.float32)
    want = pooling.adaptive_avg_pool2d(jnp.asarray(x), scale)
    in_pad = (bucket_size(in_hw[0], 16), bucket_size(in_hw[1], 16))
    got = adaptive_avg_pool2d_rt(pad_to(jnp.asarray(x), in_pad), scale,
                                 in_hw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_global_pool_rt():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 11, 19, 4)).astype(np.float32)
    want = np.mean(x, axis=(1, 2), keepdims=True)
    got = global_avg_pool_rt(pad_to(jnp.asarray(x), (16, 24)), (11, 19))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_interceptor_keeps_resnet_trunk_exact():
    """Masked padded encoder forward == unpadded forward on the valid
    region (eval mode, running BN stats)."""
    from flax import linen as nn

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder

    enc = ModelBuilder.build_encoder("resnet18dilated")
    h, w = 64, 96
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    want = enc.apply(variables, img, train=False)[-1]

    pad_hw = (96, 128)
    imgp = pad_to(img, pad_hw)
    from cvpr2021_vspw_implement_tpu.ops.masked import masked_trunk
    with masked_trunk((h, w), pad_hw):
        gotp = enc.apply(variables, imgp, train=False)[-1]
    hf, wf = gotp.shape[1:3]
    hv, wv = feature_valid(hf, wf, (h, w), pad_hw)
    hv, wv = int(hv), int(wv)
    assert (hv, wv) == tuple(want.shape[1:3])
    np.testing.assert_allclose(np.asarray(gotp[:, :hv, :wv]),
                               np.asarray(want), atol=1e-4, rtol=1e-4)
    # consumers re-mask before global ops: masked output is exact + zero pad
    masked = mask_valid(gotp, (hv, wv))
    assert float(jnp.abs(masked[:, hv:]).max(initial=0.0)) == 0.0


def test_bucketed_clip_psp_streaming_exact_and_compile_count():
    """Bucketed streaming eval == exact per-width streaming eval on
    synthetic multi-width videos, with one compiled encode/fuse pair per
    bucket (NOT per distinct width)."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP
    from cvpr2021_vspw_implement_tpu.serving import (ClipPSPBucketEngine,
                                                     ClipPSPStreamer)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipPSP(encoder=enc, num_class=7, fc_dim=512)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((4, 1, 32, 32, 3), jnp.float32),
                           train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    rng = np.random.default_rng(5)
    # three videos, three widths, TWO buckets (64->64, 72->96, 90->96)
    videos = [[rng.standard_normal((48, w, 3)).astype(np.float32)
               for _ in range(5)] for w in (64, 72, 90)]
    dilation2 = [1, 2]

    engine = ClipPSPBucketEngine(model, variables, bucket=32)
    for frames in videos:
        hw = frames[0].shape[:2]
        exact = dict(ClipPSPStreamer(model, variables, dilation2,
                                     len(frames), hw).run(iter(frames)))
        bucketed = dict(ClipPSPStreamer(model, variables, dilation2,
                                        len(frames), hw,
                                        engine=engine).run(iter(frames)))
        assert exact.keys() == bucketed.keys()
        for i in exact:
            mismatch = np.mean(exact[i] != bucketed[i])
            assert mismatch == 0.0, (hw, i, mismatch)
    assert engine.encode_shapes == [(64, 64), (64, 96)]  # 2 buckets, 3 widths


def test_mask_valid_traced_sizes():
    x = jnp.ones((1, 8, 8, 2))

    @jax.jit
    def f(hv, wv):
        return mask_valid(x, (hv, wv))

    out = f(jnp.int32(3), jnp.int32(5))
    assert float(jnp.sum(out)) == 3 * 5 * 2


def test_bucketed_upernet_exact():
    """Masked padded UPerNet forward == unpadded forward on the valid
    region.  Unlike the OS-8 heads, the FPN levels sit at different
    strides (OS 4/8/16/32), so this exercises the per-level valid-size
    derivation and every masked resize direction (down for laterals, up
    for the final fusion)."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.decoders import UPerNet
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        SegmentationModule)

    enc = ModelBuilder.build_encoder("resnet18")  # full stride pyramid
    dec = UPerNet(num_class=7, fc_dim=512, fpn_inplanes=(64, 128, 256, 512),
                  fpn_dim=64)
    model = SegmentationModule(encoder=enc, decoder=dec)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3), jnp.float32))

    rng = np.random.default_rng(11)
    for h, w in ((64, 96), (64, 70), (48, 90)):
        img = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(
            np.float32))
        want = model.apply(variables, img, train=False)[0]
        pad_hw = (bucket_size(h, 32), bucket_size(w, 32))
        gotp = model.apply(variables, pad_to(img, pad_hw),
                           train=False, valid_hw=(h, w))[0]
        hv, wv = feature_valid(gotp.shape[1], gotp.shape[2], (h, w), pad_hw)
        hv, wv = int(hv), int(wv)
        assert (hv, wv) == tuple(want.shape[1:3]), ((h, w), (hv, wv))
        np.testing.assert_allclose(np.asarray(gotp[:, :hv, :wv]),
                                   np.asarray(want), atol=2e-4, rtol=1e-4)
        # predictions (what eval consumes) must agree exactly
        assert np.array_equal(np.argmax(np.asarray(gotp[:, :hv, :wv]), -1),
                              np.argmax(np.asarray(want), -1))


def test_bucketed_hrnet_exact():
    """Masked padded HRNetV2+C1 forward == unpadded forward on the valid
    region: exercises the runtime-masked cross-resolution fusion upsamples
    at every stage (4 branch resolutions) plus the final 4-way concat."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        SegmentationModule)

    enc = ModelBuilder.build_encoder("hrnetv2")
    dec = ModelBuilder.build_decoder("c1", num_class=7, fc_dim=720)
    model = SegmentationModule(encoder=enc, decoder=dec)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3), jnp.float32))

    rng = np.random.default_rng(13)
    for h, w in ((64, 70), (48, 90)):
        img = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(
            np.float32))
        want = model.apply(variables, img, train=False)[0]
        pad_hw = (bucket_size(h, 32), bucket_size(w, 32))
        gotp = model.apply(variables, pad_to(img, pad_hw),
                           train=False, valid_hw=(h, w))[0]
        hv, wv = feature_valid(gotp.shape[1], gotp.shape[2], (h, w), pad_hw)
        hv, wv = int(hv), int(wv)
        assert (hv, wv) == tuple(want.shape[1:3]), ((h, w), (hv, wv))
        # hrnet chains ~dozens of fusion resizes, so the rt path's f32
        # integer-math weights accumulate ~1e-3 relative drift vs the
        # static path (measured 3.2e-3 worst case here); predictions —
        # what eval consumes — agree exactly
        np.testing.assert_allclose(np.asarray(gotp[:, :hv, :wv]),
                                   np.asarray(want), atol=1e-3, rtol=1e-2)
        assert np.array_equal(np.argmax(np.asarray(gotp[:, :hv, :wv]), -1),
                              np.argmax(np.asarray(want), -1))


def test_bucketed_clip_ocr_streaming_exact_and_compile_count():
    """Bucketed TCB-OCR streaming eval == exact per-width streaming eval
    on synthetic multi-width videos, one compiled encode/fuse pair per
    bucket: exercises the padded-pixel-excluded gather softmax
    (models/ocr.py::spatial_gather valid=) and the per-pixel OCR fuse on
    the padded grid."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_ocr import ClipOCRNet
    from cvpr2021_vspw_implement_tpu.serving import (ClipOCRBucketEngine,
                                                     ClipOCRStreamer)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipOCRNet(encoder=enc, num_class=7)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((4, 1, 32, 32, 3), jnp.float32),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    rng = np.random.default_rng(17)
    # three videos, three widths, TWO buckets (64->64, 72->96, 90->96)
    videos = [[rng.standard_normal((48, w, 3)).astype(np.float32)
               for _ in range(5)] for w in (64, 72, 90)]
    dilation2 = [1, 2]

    engine = ClipOCRBucketEngine(model, variables, bucket=32)
    for frames in videos:
        hw = frames[0].shape[:2]
        exact = dict(ClipOCRStreamer(model, variables, dilation2,
                                     len(frames), hw).run(iter(frames)))
        bucketed = dict(ClipOCRStreamer(model, variables, dilation2,
                                        len(frames), hw,
                                        engine=engine).run(iter(frames)))
        assert exact.keys() == bucketed.keys()
        for i in exact:
            mismatch = np.mean(exact[i] != bucketed[i])
            assert mismatch == 0.0, (hw, i, mismatch)
    assert engine.encode_shapes == [(64, 64), (64, 96)]  # 2 buckets, 3 widths


def test_masked_raft_matches_unpadded():
    """Masked (width-bucketed) RAFT == unpadded RAFT on the valid region:
    masked instance-norm statistics, masked corr-pyramid levels and masked
    GRU carries (models/raft/).  Tolerance is relative — the instance
    norm's different-shape reduction introduces ~1e-5 feature noise that
    the (untrained, random-weight) iterative refinement amplifies; trained
    refinement is contractive."""
    from cvpr2021_vspw_implement_tpu.models.raft import RAFT

    rng = np.random.default_rng(3)
    h, w = 24, 40                               # /8-aligned true size
    img1 = jnp.asarray((rng.random((1, h, w, 3)) * 255).astype(np.float32))
    img2 = jnp.asarray((rng.random((1, h, w, 3)) * 255).astype(np.float32))
    model = RAFT(iters=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                           jnp.zeros((1, 16, 16, 3)), test_mode=True)
    lo, up = model.apply(variables, img1, img2, test_mode=True)
    p1, p2 = pad_to(img1, (32, 64)), pad_to(img2, (32, 64))
    lo_m, up_m = model.apply(variables, p1, p2, test_mode=True,
                             valid_hw=(jnp.int32(h), jnp.int32(w)))
    rel_lo = (float(jnp.abs(lo_m[:, :h // 8, :w // 8] - lo).max())
              / float(jnp.abs(lo).max()))
    rel_up = (float(jnp.abs(up_m[:, :h, :w] - up).max())
              / float(jnp.abs(up).max()))
    assert rel_lo < 2e-3, rel_lo
    assert rel_up < 2e-3, rel_up


def test_bucketed_netwarp_streaming_exact_and_compile_count():
    """Bucketed NetWarp streaming eval == exact per-width streaming eval
    on synthetic multi-width videos, one compiled encode/fuse pair per
    bucket: the fuse runs the frozen RAFT at the reference's symmetric-/8
    pad geometry inside the bucket grid, runtime nearest flow resizes and
    (dim-1)-normalized masked warps."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.netwarp import NetWarp
    from cvpr2021_vspw_implement_tpu.serving import (NetWarpBucketEngine,
                                                     NetWarpStreamer)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = NetWarp(encoder=enc, num_class=7, fc_dim=512, raft_iters=2)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((2, 1, 32, 32, 3), jnp.float32),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    rng = np.random.default_rng(23)
    # two videos, two widths, ONE bucket (66->96, 90->96); the odd width
    # exercises the rolled symmetric-/8 RAFT geometry (pad_w=6, left=3)
    videos = [[rng.standard_normal((48, w, 3)).astype(np.float32)
               for _ in range(3)] for w in (66, 90)]

    engine = NetWarpBucketEngine(model, variables, bucket=32)
    for frames in videos:
        hw = frames[0].shape[:2]
        exact = dict(NetWarpStreamer(model, variables, len(frames),
                                     hw).run(frames))
        bucketed = dict(NetWarpStreamer(model, variables, len(frames), hw,
                                        engine=engine).run(frames))
        assert exact.keys() == bucketed.keys()
        for i in exact:
            mismatch = np.mean(exact[i] != bucketed[i])
            assert mismatch < 2e-3, (hw, i, mismatch)
    assert engine.encode_shapes == [(64, 96)]   # 1 bucket, 2 widths


def test_bucketed_tdnet_streaming_exact():
    """Bucketed TDNet streaming == exact per-width streaming on synthetic
    multi-width videos: masked sliced-PSP pooling, runtime spatial
    LayerNorm (masked stats + runtime-resized affine maps), and attention
    softmax excluding padded-grid tokens, with the K/V/Q queues living on
    the padded token grid."""
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_pred, inference_pred_rt)
    from cvpr2021_vspw_implement_tpu.models.td4_psp import (TD4PSP,
                                                            init_td4_state)
    from cvpr2021_vspw_implement_tpu.ops.masked import bucket_size

    model = TD4PSP(num_class=6, cropsize=63)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((4, 1, 32, 32, 3), jnp.float32),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    def os8(x):
        for _ in range(3):
            x = (x - 1) // 2 + 1
        return x

    rng = np.random.default_rng(29)
    for w in (64, 90):
        h = 48
        frames = [rng.standard_normal((1, h, w, 3)).astype(np.float32)
                  for _ in range(5)]
        tokens = (-(-os8(h) // 3)) * (-(-os8(w) // 3))
        state = init_td4_state(1, tokens)
        key = (bucket_size(h, 32), bucket_size(w, 32))
        tokens_p = (-(-os8(key[0]) // 3)) * (-(-os8(key[1]) // 3))
        state_p = init_td4_state(1, tokens_p)
        for i, f in enumerate(frames):
            out, state = model.apply(variables, jnp.asarray(f),
                                     pos_id=i % 4, state=state)
            pred = np.asarray(inference_pred((out,), (h, w)))[0]
            outp, state_p = model.apply(variables, pad_to(jnp.asarray(f),
                                                          key),
                                        pos_id=i % 4, state=state_p,
                                        valid_hw=(jnp.int32(h),
                                                  jnp.int32(w)))
            fv = feature_valid(outp.shape[1], outp.shape[2], (h, w), key)
            predp = np.asarray(inference_pred_rt(
                (outp,), key, fv, (jnp.int32(h), jnp.int32(w))))[0, :h, :w]
            mismatch = np.mean(pred != predp)
            assert mismatch < 2e-3, (w, i, mismatch)


def test_bucketed_etc_inference_exact():
    """Masked padded ETC single-frame inference == unpadded inference on
    the valid region (the conv_last 3x3 over the masked PPM concat is the
    exactness-critical step)."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.etc import ETC

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ETC(encoder=enc, num_class=7, fc_dim=512, raft_iters=1)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((2, 1, 32, 32, 3), jnp.float32),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    rng = np.random.default_rng(31)
    for h, w in ((48, 70), (48, 90)):
        imgs = jnp.asarray(rng.standard_normal((2, 1, h, w, 3)).astype(
            np.float32))
        (want,) = model.apply(variables, imgs, train=False)
        pad_hw = (bucket_size(h, 32), bucket_size(w, 32))
        imgp = jnp.pad(imgs, ((0, 0), (0, 0), (0, pad_hw[0] - h),
                              (0, pad_hw[1] - w), (0, 0)))
        (gotp,) = model.apply(variables, imgp, train=False,
                              valid_hw=(jnp.int32(h), jnp.int32(w)))
        hv, wv = feature_valid(gotp.shape[1], gotp.shape[2], (h, w), pad_hw)
        hv, wv = int(hv), int(wv)
        assert (hv, wv) == tuple(want.shape[1:3])
        np.testing.assert_allclose(np.asarray(gotp[:, :hv, :wv]),
                                   np.asarray(want), atol=2e-4, rtol=1e-4)
        assert np.array_equal(np.argmax(np.asarray(gotp[:, :hv, :wv]), -1),
                              np.argmax(np.asarray(want), -1))


@pytest.mark.parametrize("arch_decoder", ["ocrnet_deepsup", "deeplab",
                                          "nonlocal2d"])
def test_bucketed_round4_decoders_exact(arch_decoder):
    """Masked padded forward == unpadded forward on the valid region for
    the decoder families added to BUCKETED_DECODERS in round 4 (VERDICT r3
    item 3): the OCR spatial gather excludes padded pixels via the -inf
    softmax mask; DeepLab's masked ASPP image pool + runtime OS8→OS4 merge
    resize; NonLocal2d's padded-key-excluded attention with the TRUE
    position count as the dot-mode normalizer."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        SegmentationModule)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    dec = ModelBuilder.build_decoder(arch_decoder, num_class=7, fc_dim=512)
    model = SegmentationModule(encoder=enc, decoder=dec)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3), jnp.float32))

    rng = np.random.default_rng(37)
    for h, w in ((64, 70), (48, 90)):
        img = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(
            np.float32))
        want = model.apply(variables, img, train=False)[0]
        pad_hw = (bucket_size(h, 32), bucket_size(w, 32))
        gotp = model.apply(variables, pad_to(img, pad_hw),
                           train=False, valid_hw=(h, w))[0]
        hv, wv = feature_valid(gotp.shape[1], gotp.shape[2], (h, w), pad_hw)
        hv, wv = int(hv), int(wv)
        assert (hv, wv) == tuple(want.shape[1:3]), ((h, w), (hv, wv))
        np.testing.assert_allclose(np.asarray(gotp[:, :hv, :wv]),
                                   np.asarray(want), atol=2e-4, rtol=1e-4)
        assert np.array_equal(np.argmax(np.asarray(gotp[:, :hv, :wv]), -1),
                              np.argmax(np.asarray(want), -1))


# ---------------------------------------------------------------------------
# Round-4 clip-side window paths (VERDICT r3 item 3 remainder): every
# --method's window forward accepts runtime-valid sizes.
# ---------------------------------------------------------------------------

def _assert_window_exact(model, variables, imgs, want, apply_kwargs=None,
                         atol=2e-4):
    """Padded masked window forward == unpadded forward on the valid
    region, for a model whose __call__ takes (imgs [T,B,H,W,3], train,
    valid_hw)."""
    t, b, h, w, _ = imgs.shape
    pad_hw = (bucket_size(h, 32), bucket_size(w, 32))
    imgp = jnp.pad(imgs, ((0, 0), (0, 0), (0, pad_hw[0] - h),
                          (0, pad_hw[1] - w), (0, 0)))
    got = model.apply(variables, imgp, train=False,
                      valid_hw=(jnp.int32(h), jnp.int32(w)),
                      **(apply_kwargs or {}))
    return got, pad_hw


def _crop_check(gotp, want, true_hw, pad_hw, atol=2e-4, rtol=1e-4):
    hv, wv = feature_valid(gotp.shape[-3], gotp.shape[-2], true_hw, pad_hw)
    hv, wv = int(hv), int(wv)
    assert (hv, wv) == tuple(want.shape[-3:-1]), (true_hw, (hv, wv))
    got_v = np.asarray(gotp[..., :hv, :wv, :])
    np.testing.assert_allclose(got_v, np.asarray(want), atol=atol,
                               rtol=rtol)
    assert np.array_equal(np.argmax(got_v, -1),
                          np.argmax(np.asarray(want), -1))


def test_bucketed_clip_psp_window_psp_weight_exact():
    """ClipPSP WINDOW forward with psp_weight (the one variant the
    streamer's stat cache cannot serve bit-exactly was the per-shape
    holdout): masked trunk + valid-region pooled stats + runtime psp
    weights == unpadded run."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipPSP(encoder=enc, num_class=7, fc_dim=512, psp_weight=True)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((3, 1, 48, 48, 3), jnp.float32),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    rng = np.random.default_rng(41)
    for h, w in ((48, 70), (48, 90)):
        imgs = jnp.asarray(rng.standard_normal((3, 1, h, w, 3)).astype(
            np.float32))
        (want,) = model.apply(variables, imgs, train=False)
        (gotp,), pad_hw = _assert_window_exact(model, variables, imgs, want)
        _crop_check(gotp, want, (h, w), pad_hw)


@pytest.mark.parametrize("variant", ["clipocr_all", "memory"])
def test_bucketed_clip_ocr_window_exact(variant):
    """ClipOCR window paths the streamer cannot serve: clipocr_all
    (attention on every frame) and the streaming memory ring."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_ocr import (ClipOCRNet,
                                                             init_memory)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipOCRNet(encoder=enc, num_class=7,
                       clipocr_all=(variant == "clipocr_all"))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((3, 1, 48, 48, 3), jnp.float32),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    rng = np.random.default_rng(43)
    for h, w in ((48, 70), (48, 90)):
        imgs = jnp.asarray(rng.standard_normal((3, 1, h, w, 3)).astype(
            np.float32))
        pad_hw = (bucket_size(h, 32), bucket_size(w, 32))
        imgp = jnp.pad(imgs, ((0, 0), (0, 0), (0, pad_hw[0] - h),
                              (0, pad_hw[1] - w), (0, 0)))
        if variant == "memory":
            mem0 = init_memory(4, 1, 7)
            (want,), mem_w = model.apply(variables, imgs, train=False,
                                         memory=mem0)
            (gotp,), mem_g = model.apply(
                variables, imgp, train=False, memory=mem0,
                valid_hw=(jnp.int32(h), jnp.int32(w)))
            # the cached region contexts must match too (they feed the
            # NEXT window's blend)
            np.testing.assert_allclose(np.asarray(mem_g[0]),
                                       np.asarray(mem_w[0]), atol=2e-4,
                                       rtol=1e-4)
        else:
            (want,) = model.apply(variables, imgs, train=False)
            (gotp,) = model.apply(variables, imgp, train=False,
                                  valid_hw=(jnp.int32(h), jnp.int32(w)))
        _crop_check(gotp, want, (h, w), pad_hw)


@pytest.mark.parametrize("mode", ["sigmoid", "distsoftmax", "distnearest"])
def test_bucketed_our_warp_window_exact(mode):
    """ClipWarpNet masked window forward == unpadded for every cost-volume
    aggregation mode; beyond-valid window positions get |y|^2=1e20 / y=0 —
    exactly the unpadded run's out-of-bounds treatment (incl. the
    distnearest argmax tie order)."""
    import argparse

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.warp_our import ClipWarpNet

    args = argparse.Namespace(
        num_class=7, clip_num=3, fix=False, max_distances=[2],
        linear_combine=False, distsoftmax=(mode == "distsoftmax"),
        distnearest=(mode == "distnearest"), temp=3.0, allsup=False,
        allsup_scale=0.3)
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipWarpNet(encoder=enc, num_class=7, fc_dim=512, args=args)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((3, 1, 48, 48, 3), jnp.float32),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    rng = np.random.default_rng(47)
    for h, w in ((48, 70),):
        imgs = jnp.asarray(rng.standard_normal((3, 1, h, w, 3)).astype(
            np.float32))
        (want,) = model.apply(variables, imgs, train=False)
        (gotp,), pad_hw = _assert_window_exact(model, variables, imgs, want)
        _crop_check(gotp, want, (h, w), pad_hw)


def test_bucketed_propnet_window_exact():
    """PropNet masked inference == unpadded: beyond-valid positions'
    sigmoid-squashed distance is exactly the 'class absent' score 1.0, so
    whatever label the padding appears to carry cannot win the min."""
    import argparse

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.propnet import PropNet

    args = argparse.Namespace(num_class=7, clip_num=3, max_distances=[2])
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = PropNet(encoder=enc, num_class=7, fc_dim=512, args=args)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((3, 1, 48, 48, 3), jnp.float32),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    rng = np.random.default_rng(53)
    imgs = jnp.asarray(rng.standard_normal((3, 1, 48, 70, 3)).astype(
        np.float32))
    (want,) = model.apply(variables, imgs, train=False)
    (gotp,), pad_hw = _assert_window_exact(model, variables, imgs, want)
    _crop_check(gotp, want, (48, 70), pad_hw)


def test_bucketed_warp_merge_window_exact():
    """OurWarpMerge masked inference == unpadded (C4-embedding cost
    volumes, first-neighbor quirk kept)."""
    import argparse

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.warp_our_merge import (
        OurWarpMerge)

    args = argparse.Namespace(num_class=7, clip_num=3, max_distances=[2],
                              distsoftmax=False, distnearest=False,
                              temp=3.0)
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = OurWarpMerge(encoder=enc, num_class=7, fc_dim=512, args=args)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((3, 1, 48, 48, 3), jnp.float32),
                           train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    rng = np.random.default_rng(59)
    imgs = jnp.asarray(rng.standard_normal((3, 1, 48, 70, 3)).astype(
        np.float32))
    (want,) = model.apply(variables, imgs, train=False)
    (gotp,), pad_hw = _assert_window_exact(model, variables, imgs, want)
    _crop_check(gotp, want, (48, 70), pad_hw)


def test_bucketed_nonlocal3d_window_exact():
    """NonLocal3D masked window forward == unpadded: the space-TIME
    attention excludes padded key positions on every frame and the
    dot-mode normalizer uses the TRUE position count."""
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.nonlocal3d import NonLocal3D

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = NonLocal3D(encoder=enc, num_class=7, fc_dim=512)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((3, 1, 48, 48, 3), jnp.float32),
                           train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    rng = np.random.default_rng(61)
    imgs = jnp.asarray(rng.standard_normal((3, 1, 48, 70, 3)).astype(
        np.float32))
    want = model.apply(variables, imgs, train=False)      # [T,B,h,w,K]
    gotp, pad_hw = _assert_window_exact(model, variables, imgs, want)
    _crop_check(gotp, want, (48, 70), pad_hw)


def test_bucketed_hrnet_clip_exact():
    """SegmentationModuleClip (hrnetv2_clip + C1): masked stem +
    valid-region TimeAtten pooling + runtime-masked HRNet fusion resizes
    == unpadded run."""
    import argparse

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.hrnet_clip import (
        HRNetV2Clip, SegmentationModuleClip)

    args = argparse.Namespace(clip_middle=True)
    enc = HRNetV2Clip(args=args)
    dec = ModelBuilder.build_decoder("c1", num_class=7, fc_dim=720)
    model = SegmentationModuleClip(encoder=enc, decoder=dec)
    rng = np.random.default_rng(67)
    c0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           c0, jnp.zeros((2, 1, 32, 32, 3), jnp.float32),
                           train=False)
    h, w = 48, 70
    c_img = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(
        np.float32))
    clip = jnp.asarray(rng.standard_normal((2, 1, h, w, 3)).astype(
        np.float32))
    (want,) = model.apply(variables, c_img, clip, train=False)
    pad_hw = (bucket_size(h, 32), bucket_size(w, 32))
    cp = pad_to(c_img, pad_hw)
    clp = jnp.pad(clip, ((0, 0), (0, 0), (0, pad_hw[0] - h),
                         (0, pad_hw[1] - w), (0, 0)))
    (gotp,) = model.apply(variables, cp, clp, train=False,
                          valid_hw=(jnp.int32(h), jnp.int32(w)))
    # HRNet's ~dozens of chained f32 runtime-resize weight matrices carry
    # small relative logit drift (ROADMAP r3 hrnet note; ~7e-3 max at the
    # random-init magnitudes here); predictions (argmax, asserted inside)
    # stay pixel-exact
    _crop_check(gotp, want, (h, w), pad_hw, atol=1e-3, rtol=1e-2)
