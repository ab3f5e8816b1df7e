"""NetWarp / ETC contract tests (small encoder, tiny RAFT iters)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
from cvpr2021_vspw_implement_tpu.models.etc import ETC, etc_loss
from cvpr2021_vspw_implement_tpu.models.netwarp import NetWarp, netwarp_loss
from cvpr2021_vspw_implement_tpu.parallel.optim import make_lr_mult

KEY = jax.random.PRNGKey(0)


def _batch(t1=2, b=1, h=64, w=64, c=5, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "img": jnp.asarray(rng.standard_normal((t1, b, h, w, 3), np.float32) * 0.5),
        "labels": jnp.asarray(rng.integers(0, c, (t1, b, h, w)), jnp.int32),
    }


@pytest.mark.parametrize("ocr", [False, True])
def test_netwarp_train_eval(ocr):
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = NetWarp(encoder=enc, num_class=5, fc_dim=512, ocr=ocr,
                    raft_iters=2)
    batch = _batch()
    variables = model.init({"params": KEY, "dropout": KEY}, batch["img"],
                           train=True)
    outs, _ = model.apply(variables, batch["img"], train=True,
                          mutable=["batch_stats"], rngs={"dropout": KEY})
    pred, deepsup = outs
    assert pred.shape == (1, 8, 8, 5)
    assert deepsup.shape == (2, 8, 8, 5)
    loss, acc = netwarp_loss(outs, batch, ocr=ocr)
    assert np.isfinite(float(loss))

    eval_outs = model.apply(variables, batch["img"], train=False)
    assert eval_outs[0].shape == (1, 8, 8, 5)

    # raft subtree exists and is frozen by the lr-mult tree
    assert "raft" in variables["params"]
    mult = make_lr_mult(variables["params"])
    raft_mults = jax.tree_util.tree_leaves(mult["raft"])
    assert all(m == 0.0 for m in raft_mults)
    other = jax.tree_util.tree_leaves(
        {k: v for k, v in mult.items() if k != "raft"})
    assert all(m in (0.1, 1.0) for m in other)


@pytest.mark.parametrize("ocr", [False, True])
def test_etc_train_eval(ocr):
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ETC(encoder=enc, num_class=5, fc_dim=512, ocr=ocr, raft_iters=2)
    batch = _batch(seed=1)
    variables = model.init({"params": KEY, "dropout": KEY}, batch["img"],
                           train=True)
    outs, _ = model.apply(variables, batch["img"], train=True,
                          mutable=["batch_stats"], rngs={"dropout": KEY})
    assert outs["pred_t"].shape == (1, 8, 8, 5)
    assert outs["flow"].shape == (1, 64, 64, 2)
    loss, acc = etc_loss(outs, batch, ocr=ocr)
    assert np.isfinite(float(loss))
    # ST term contributes: st_weight=0 must change the loss
    loss0, _ = etc_loss(outs, batch, ocr=ocr, st_weight=0.0)
    assert float(loss) != pytest.approx(float(loss0))

    eval_outs = model.apply(variables, batch["img"], train=False)
    assert eval_outs[0].shape == (1, 8, 8, 5)


def test_netwarp_gradients_flow_but_not_into_raft():
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = NetWarp(encoder=enc, num_class=5, fc_dim=512, raft_iters=1)
    batch = _batch(h=32, w=32, seed=2)
    variables = model.init({"params": KEY, "dropout": KEY}, batch["img"],
                           train=True)

    def loss_fn(params):
        outs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["img"], train=True, mutable=["batch_stats"],
            rngs={"dropout": KEY})
        return netwarp_loss(outs, batch)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    # at init w0_1 = w1_1 = 0 so the warp branch (and hence flowcnn) gets
    # exactly zero grad — faithful to the reference init; the blend weights
    # themselves DO get gradient, which is what trains the branch open
    assert float(jnp.abs(grads["w0_1"]).max()) > 0
    assert float(jnp.abs(grads["w1_1"]).max()) > 0
    enc = jax.tree_util.tree_leaves(grads["encoder"])
    assert any(float(jnp.abs(g).max()) > 0 for g in enc)
    # raft receives no gradient (flow is stop_gradient'ed)
    rg = jax.tree_util.tree_leaves(grads["raft"])
    assert all(float(jnp.abs(g).max()) == 0 for g in rg)
