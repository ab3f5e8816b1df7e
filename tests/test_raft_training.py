"""RAFT training harness tests (sequence loss parity, train step, IO, viz)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.raft import RAFT
from cvpr2021_vspw_implement_tpu.models.raft.flow_viz import flow_to_image
from cvpr2021_vspw_implement_tpu.models.raft.frame_utils import (
    read_flo, read_kitti_png, write_flo, write_kitti_png)
from cvpr2021_vspw_implement_tpu.models.raft.training import (
    make_flow_optimizer, make_flow_train_step, sequence_loss, validate_epe)

RNG = np.random.default_rng(0)


def test_sequence_loss_matches_torch():
    n, b, h, w = 3, 2, 8, 10
    preds = RNG.standard_normal((n, b, h, w, 2), np.float32) * 3
    gt = RNG.standard_normal((b, h, w, 2), np.float32) * 3
    valid = (RNG.random((b, h, w)) > 0.3).astype(np.float32)

    loss, metrics = sequence_loss(jnp.asarray(preds), jnp.asarray(gt),
                                  jnp.asarray(valid), gamma=0.8)

    # torch replica of RAFT/train.py:47-71
    tp = [torch.from_numpy(preds[i].transpose(0, 3, 1, 2)) for i in range(n)]
    tg = torch.from_numpy(gt.transpose(0, 3, 1, 2))
    tv = torch.from_numpy(valid)
    mag = torch.sum(tg ** 2, dim=1).sqrt()
    v = (tv >= 0.5) & (mag < 400)
    ref = 0.0
    for i in range(n):
        ref = ref + 0.8 ** (n - i - 1) * (v[:, None] * (tp[i] - tg).abs()).mean()
    epe = torch.sum((tp[-1] - tg) ** 2, dim=1).sqrt().view(-1)[v.view(-1)]
    assert float(loss) == pytest.approx(float(ref), rel=1e-5)
    assert float(metrics["epe"]) == pytest.approx(float(epe.mean()), rel=1e-4)
    assert float(metrics["1px"]) == pytest.approx(
        float((epe < 1).float().mean()), abs=1e-5)


def test_flow_train_step_reduces_loss():
    model = RAFT(iters=2)
    img1 = jnp.asarray(RNG.random((1, 64, 64, 3), np.float32) * 255)
    img2 = jnp.asarray(RNG.random((1, 64, 64, 3), np.float32) * 255)
    flow = jnp.zeros((1, 64, 64, 2))
    valid = jnp.ones((1, 64, 64))
    variables = model.init({"params": jax.random.PRNGKey(0)}, img1, img2)
    params = variables["params"]
    tx = make_flow_optimizer(lr=1e-4, num_steps=50)
    opt_state = tx.init(params)
    step = make_flow_train_step(model, tx,
                                batch_stats=variables["batch_stats"])
    batch = {"img1": img1, "img2": img2, "flow": flow, "valid": valid}
    params, opt_state, m0 = step(params, opt_state, batch)
    for _ in range(4):
        params, opt_state, m = step(params, opt_state, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_validate_epe_zero_for_perfect_prediction():
    model = RAFT(iters=2)
    img = RNG.random((64, 64, 3)).astype(np.float32) * 255
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(img[None]), jnp.asarray(img[None]))

    @jax.jit
    def flow_fn(i1, i2):
        _, f = model.apply(variables, i1, i2, test_mode=True)
        return f

    pred = np.asarray(flow_fn(jnp.asarray(img[None]), jnp.asarray(img[None])))[0]
    epe = validate_epe(model, variables, [(img, img, pred)])
    assert epe == pytest.approx(0.0, abs=1e-5)


def test_flo_roundtrip(tmp_path):
    flow = RNG.standard_normal((7, 9, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    np.testing.assert_allclose(read_flo(p), flow)


def test_kitti_png_roundtrip(tmp_path):
    flow = (RNG.standard_normal((7, 9, 2)) * 10).astype(np.float32)
    valid = (RNG.random((7, 9)) > 0.5).astype(np.float32)
    p = str(tmp_path / "x.png")
    write_kitti_png(p, flow, valid)
    f2, v2 = read_kitti_png(p)
    np.testing.assert_allclose(f2, flow, atol=1 / 64)
    np.testing.assert_array_equal(v2, valid)


def test_flow_viz():
    flow = np.zeros((5, 5, 2), np.float32)
    flow[..., 0] = 3.0
    img = flow_to_image(flow)
    assert img.shape == (5, 5, 3) and img.dtype == np.uint8
    # uniform flow → uniform color
    assert (img == img[0, 0]).all()
