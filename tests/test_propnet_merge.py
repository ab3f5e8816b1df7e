"""PropNet / OurWarpMerge contract tests."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder

KEY = jax.random.PRNGKey(0)


def _args(**kw):
    ns = argparse.Namespace(max_distances=[2], linear_combine=False,
                            distsoftmax=False, distnearest=False, temp=3.0,
                            fix=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_prop_pred_hand_example():
    from cvpr2021_vspw_implement_tpu.models.propnet import prop_pred
    # 1x1 feature map degenerates: window = single position
    prev = jnp.ones((1, 2, 2, 3))
    query = jnp.ones((1, 2, 2, 3))
    labels = jnp.array([[[0, 1], [1, 0]]], jnp.int32)
    out = prop_pred(prev, query, labels, max_distance=1, num_class=2)
    assert out.shape == (1, 2, 2, 2)
    # identical embeddings → dist 0 → squashed to 0 where class present
    assert float(out[0, 0, 0, 0]) == pytest.approx(0.0, abs=1e-6)
    # class present somewhere in every 3x3 window here
    assert float(out.max()) <= 1.0


def test_propnet_train_eval():
    from cvpr2021_vspw_implement_tpu.models.propnet import PropNet, propnet_loss
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = PropNet(encoder=enc, num_class=5, fc_dim=512, args=_args())
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((3, 1, 32, 32, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (3, 1, 32, 32)), jnp.int32)
    variables = model.init({"params": KEY, "dropout": KEY}, imgs, train=True)
    outs, _ = model.apply(variables, imgs, train=True,
                          mutable=["batch_stats"], rngs={"dropout": KEY})
    assert len(outs["preds_c"]) == 2
    loss, acc = propnet_loss(outs, {"labels": labels})
    assert np.isfinite(float(loss))
    (pred,) = model.apply(variables, imgs, train=False)
    assert pred.shape == (1, 4, 4, 5)


def test_warp_merge_train_eval():
    from cvpr2021_vspw_implement_tpu.models.warp_our_merge import (
        OurWarpMerge, warp_merge_loss)
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = OurWarpMerge(encoder=enc, num_class=5, fc_dim=512, args=_args())
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((3, 1, 32, 32, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (3, 1, 32, 32)), jnp.int32)
    variables = model.init({"params": KEY, "dropout": KEY}, imgs, train=True)
    outs, _ = model.apply(variables, imgs, train=True,
                          mutable=["batch_stats"], rngs={"dropout": KEY})
    # reference quirk: only ONE neighbor contributes
    assert len(outs["preds_c"]) == 1
    loss, acc = warp_merge_loss(outs, {"labels": labels})
    assert np.isfinite(float(loss))
    (pred,) = model.apply(variables, imgs, train=False)
    assert pred.shape == (1, 4, 4, 5)
