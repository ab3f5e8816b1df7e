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


class _StubFlowModel:
    """Any object with .apply works for the validate_* harnesses; returns a
    fixed flow field regardless of input (pads are zero when inputs are /8)."""

    def __init__(self, flow):
        self.flow = flow

    def apply(self, variables, i1, i2, test_mode=False):
        import jax.numpy as jnp
        return None, jnp.asarray(self.flow[None])


def test_validate_sintel_metric_math():
    """EPE + 1/3/5px pooled-pixel rates exactly as the reference computes
    them (RAFT/evaluate.py:115-123; the reference module itself imports cv2
    which is absent, so the oracle is the transcribed formula)."""
    from cvpr2021_vspw_implement_tpu.models.raft.training import (
        validate_sintel)
    rng = np.random.default_rng(9)
    h, w = 16, 24  # /8 → padder is a no-op
    items = []
    for _ in range(3):
        img = rng.standard_normal((h, w, 3)).astype(np.float32)
        gt = rng.uniform(-6, 6, (h, w, 2)).astype(np.float32)
        items.append((img, img, gt))
    pred = rng.uniform(-6, 6, (h, w, 2)).astype(np.float32)

    got = validate_sintel(_StubFlowModel(pred), {}, items)

    epes = np.concatenate([
        np.sqrt(np.sum((pred - gt) ** 2, axis=-1)).reshape(-1)
        for _, _, gt in items])
    np.testing.assert_allclose(got["epe"], epes.mean(), rtol=1e-6)
    np.testing.assert_allclose(got["1px"], np.mean(epes < 1), rtol=1e-6)
    np.testing.assert_allclose(got["3px"], np.mean(epes < 3), rtol=1e-6)
    np.testing.assert_allclose(got["5px"], np.mean(epes < 5), rtol=1e-6)


def test_validate_kitti_metric_math():
    """Per-image valid EPE mean + pooled F1-all (epe>3 & epe/mag>0.05),
    reference: RAFT/evaluate.py:148-166."""
    from cvpr2021_vspw_implement_tpu.models.raft.training import (
        validate_kitti)
    rng = np.random.default_rng(10)
    h, w = 16, 24
    items, ref_epes, ref_outs = [], [], []
    pred = rng.uniform(-8, 8, (h, w, 2)).astype(np.float32)
    for _ in range(2):
        img = rng.standard_normal((h, w, 3)).astype(np.float32)
        gt = rng.uniform(-8, 8, (h, w, 2)).astype(np.float32)
        valid = (rng.random((h, w)) > 0.3).astype(np.float32)
        items.append((img, img, gt, valid))
        epe = np.sqrt(np.sum((pred - gt) ** 2, -1)).reshape(-1)
        mag = np.sqrt(np.sum(gt ** 2, -1)).reshape(-1)
        v = valid.reshape(-1) >= 0.5
        ref_epes.append(epe[v].mean())
        ref_outs.append(((epe > 3.0) & (epe / mag > 0.05))[v])

    got = validate_kitti(_StubFlowModel(pred), {}, items)
    np.testing.assert_allclose(got["epe"], np.mean(ref_epes), rtol=1e-6)
    np.testing.assert_allclose(
        got["f1"], 100 * np.mean(np.concatenate(ref_outs)), rtol=1e-6)


def test_validate_smoke_with_real_raft_and_padding():
    """End-to-end validate_* over a real (tiny) RAFT with non-/8 inputs —
    exercises the sintel and kitti padders."""
    from cvpr2021_vspw_implement_tpu.models.raft.raft import RAFT
    from cvpr2021_vspw_implement_tpu.models.raft.training import (
        validate_kitti, validate_sintel)
    rng = np.random.default_rng(11)
    model = RAFT(iters=2, corr_levels=2)
    h, w = 36, 44  # pads to 40x48
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(img[None]), jnp.asarray(img[None]),
                           test_mode=True)
    gt = rng.uniform(-2, 2, (h, w, 2)).astype(np.float32)
    valid = np.ones((h, w), np.float32)
    s = validate_sintel(model, variables, [(img, img, gt)])
    k = validate_kitti(model, variables, [(img, img, gt, valid)])
    assert np.isfinite(s["epe"]) and 0 <= s["3px"] <= 1
    assert np.isfinite(k["epe"]) and 0 <= k["f1"] <= 100
