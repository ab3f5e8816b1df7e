"""HRNetV2 / HRNetV2-clip / BiConvLSTM-allclip contract tests."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_hrnetv2_output_channels():
    from cvpr2021_vspw_implement_tpu.models.hrnet import HRNetV2
    model = HRNetV2()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": KEY}, x, train=False)
    (out,) = model.apply(variables, x, train=False)
    # W48: concat of 48+96+192+384 = 720 channels at OS 4
    assert out.shape == (1, 16, 16, 720)


def test_hrnet_clip_time_atten():
    from cvpr2021_vspw_implement_tpu.models.hrnet_clip import HRNetV2Clip
    args = argparse.Namespace(clip_middle=True)
    model = HRNetV2Clip(args=args)
    rng = np.random.default_rng(0)
    c_img = jnp.asarray(rng.standard_normal((1, 32, 32, 3), np.float32))
    clip = jnp.asarray(rng.standard_normal((2, 1, 32, 32, 3), np.float32))
    variables = model.init({"params": KEY}, c_img, clip, train=False)
    (out,) = model.apply(variables, c_img, clip, train=False)
    assert out.shape == (1, 8, 8, 720)
    # perturbing a clip frame changes the output through TimeAtten
    (out2,) = model.apply(variables, c_img, clip.at[0].add(1.0), train=False)
    assert float(jnp.abs(out - out2).max()) > 1e-6


def test_biconvlstm_allclip():
    from cvpr2021_vspw_implement_tpu.models.biconvlstm import (
        SegmentationModuleAllClip, allclip_loss)
    from cvpr2021_vspw_implement_tpu.models.hrnet import HRNetV2

    model = SegmentationModuleAllClip(encoder=HRNetV2(), num_class=5,
                                      head="convlstm")
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((2, 1, 32, 32, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (2, 1, 32, 32)), jnp.int32)
    variables = model.init({"params": KEY}, imgs, train=True)
    outs = model.apply(variables, imgs, train=True,
                       mutable=["batch_stats"])[0]
    assert outs.shape == (2, 1, 8, 8, 5)
    loss, acc = allclip_loss(outs, {"labels": labels})
    assert np.isfinite(float(loss))

    # encoder receives no gradient (frozen)
    def loss_fn(params):
        o = model.apply({"params": params,
                         "batch_stats": variables.get("batch_stats", {})},
                        imgs, train=True, mutable=["batch_stats"])[0]
        return allclip_loss(o, {"labels": labels})[0]

    grads = jax.grad(loss_fn)(variables["params"])
    enc_g = jax.tree_util.tree_leaves(grads["encoder"])
    assert all(float(jnp.abs(g).max()) == 0 for g in enc_g)
    head_g = jax.tree_util.tree_leaves(grads["prop_clip"])
    assert any(float(jnp.abs(g).max()) > 0 for g in head_g)


def test_nonlocal_allclip_head():
    from cvpr2021_vspw_implement_tpu.models.biconvlstm import (
        SegmentationModuleAllClip)
    from cvpr2021_vspw_implement_tpu.models.hrnet import HRNetV2
    model = SegmentationModuleAllClip(encoder=HRNetV2(), num_class=5,
                                      head="non_local")
    imgs = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 1, 32, 32, 3), np.float32))
    variables = model.init({"params": KEY}, imgs, train=False)
    outs = model.apply(variables, imgs, train=False)
    assert outs.shape == (2, 1, 8, 8, 5)
