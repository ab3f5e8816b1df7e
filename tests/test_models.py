"""Shape/contract tests for encoders, decoders and the segmentation loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.models import (
    ModelBuilder, SegmentationModule, inference_probs, nll_loss,
    segmentation_loss)

KEY = jax.random.PRNGKey(0)


def _init_apply(model, x, train=False):
    variables = model.init({"params": KEY, "dropout": KEY}, x, train=train)
    out = model.apply(variables, x, train=train,
                      mutable=["batch_stats"] if train else False,
                      rngs={"dropout": KEY} if train else None)
    return (out[0], variables) if train else (out, variables)


def test_resnet18_dilated_pyramid_shapes():
    enc = ModelBuilder.build_encoder("resnet18dilated")
    x = jnp.zeros((1, 64, 64, 3))
    feats, _ = _init_apply(enc, x)
    shapes = [f.shape for f in feats]
    # OS 4, 8, 8, 8 after dilation surgery; channels 64/128/256/512
    assert shapes == [(1, 16, 16, 64), (1, 8, 8, 128),
                      (1, 8, 8, 256), (1, 8, 8, 512)]


def test_resnet50_dilated_pyramid_shapes():
    enc = ModelBuilder.build_encoder("resnet50dilated")
    x = jnp.zeros((1, 32, 32, 3))
    feats, _ = _init_apply(enc, x)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]
    assert feats[-1].shape[1:3] == (4, 4)


def test_resnet_undilated_os32():
    enc = ModelBuilder.build_encoder("resnet18")
    x = jnp.zeros((1, 64, 64, 3))
    feats, _ = _init_apply(enc, x)
    assert feats[-1].shape == (1, 2, 2, 512)


def test_mobilenetv2_dilated_shapes():
    enc = ModelBuilder.build_encoder("mobilenetv2dilated")
    x = jnp.zeros((1, 64, 64, 3))
    feats, _ = _init_apply(enc, x)
    assert [f.shape[-1] for f in feats] == [24, 32, 64, 160, 320]
    # dilated: last three taps at OS 8
    assert feats[-1].shape[1:3] == (8, 8)
    assert feats[1].shape[1:3] == (8, 8)


@pytest.mark.parametrize("arch,extra", [
    ("c1", {}), ("c1_deepsup", {}), ("ppm", {}), ("ppm_deepsup", {}),
])
def test_decoders_output_shapes(arch, extra):
    dec = ModelBuilder.build_decoder(arch, fc_dim=512, num_class=7)
    conv_out = [jnp.zeros((2, 16, 16, 64)), jnp.zeros((2, 8, 8, 128)),
                jnp.zeros((2, 8, 8, 256)), jnp.zeros((2, 8, 8, 512))]
    out, _ = _init_apply(dec, conv_out, train=True)
    assert out[0].shape == (2, 8, 8, 7)
    if arch.endswith("deepsup"):
        assert len(out) == 2 and out[1].shape == (2, 8, 8, 7)
    # eval mode: single logits tuple
    out_eval, _ = _init_apply(dec, conv_out, train=False)
    assert len(out_eval) == 1


def test_upernet_output_at_p2():
    dec = ModelBuilder.build_decoder("upernet_lite", fc_dim=512, num_class=7)
    conv_out = [jnp.zeros((1, 16, 16, 64)), jnp.zeros((1, 8, 8, 128)),
                jnp.zeros((1, 8, 8, 256)), jnp.zeros((1, 8, 8, 512))]
    dec = dec.clone(fpn_inplanes=(64, 128, 256, 512))
    out, _ = _init_apply(dec, conv_out, train=True)
    assert out[0].shape == (1, 16, 16, 7)  # P2 resolution


def test_ppm_clip_decoder_contract():
    dec = ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=512, num_class=7)
    conv_out = [jnp.zeros((2, 16, 16, 64)), jnp.zeros((2, 8, 8, 128)),
                jnp.zeros((2, 8, 8, 256)), jnp.zeros((2, 8, 8, 512))]
    (deepsup, emb, ppm_out), _ = _init_apply(dec, conv_out, train=True)
    assert deepsup.shape == (2, 8, 8, 7)
    assert emb.shape == (2, 8, 8, 512)
    assert ppm_out.shape[-1] == 512 + 4 * 512


def test_nll_loss_matches_torch():
    import torch
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 4, 5, 6), dtype=np.float32)
    label = rng.integers(0, 6, size=(2, 4, 5))
    label[0, 0, :2] = 255
    ours = float(nll_loss(jnp.asarray(logits), jnp.asarray(label)))
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    crit = torch.nn.NLLLoss(ignore_index=255)
    ref = crit(torch.nn.functional.log_softmax(lt, 1),
               torch.from_numpy(label).long()).item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_segmentation_module_end_to_end_loss_and_grads():
    enc = ModelBuilder.build_encoder("resnet18dilated")
    dec = ModelBuilder.build_decoder("ppm_deepsup", fc_dim=512, num_class=7)
    model = SegmentationModule(enc, dec)
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3), dtype=np.float32))
    label = jnp.asarray(np.random.default_rng(1).integers(0, 7, (2, 64, 64)))
    variables = model.init({"params": KEY, "dropout": KEY}, img, train=True)

    def loss_fn(params):
        outs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, train=True, mutable=["batch_stats"], rngs={"dropout": KEY})
        loss, acc = segmentation_loss(outs, label, deep_sup_scale=0.4)
        return loss, acc

    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    # inference contract: softmax probs at seg_size
    outs = model.apply(variables, img, train=False)
    probs = inference_probs(outs, (64, 64))
    assert probs.shape == (2, 64, 64, 7)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)
