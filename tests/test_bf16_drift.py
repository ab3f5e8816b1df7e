"""bf16-vs-f32 trajectory drift bound for the jitted clip train step.

Small-scale analogue of tools/bf16_drift.py (whose 100-step flagship-shape
TPU measurement is recorded in PARITY.md): runs the same seeded synthetic
trajectory with bfloat16 compute and f32 compute from identical f32 params
and asserts the per-step loss drift stays within a loose bound — i.e. bf16
compute changes the loss trajectory by noise, not by divergence.
Trajectory semantics: /root/reference/train_clip2.py:26-126.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP, clip_psp_loss
from cvpr2021_vspw_implement_tpu.parallel.optim import create_clip_optimizer
from cvpr2021_vspw_implement_tpu.parallel.train_state import (TrainState,
                                                              make_train_step)

STEPS = 12
NUM_CLASS = 17
T, B, HW = 3, 2, 48


def _run(dtype, variables, pool):
    enc = ModelBuilder.build_encoder("resnet18dilated", fc_dim=512,
                                     dtype=dtype)
    model = ClipPSP(encoder=enc, num_class=NUM_CLASS, fc_dim=512, dtype=dtype)
    tx = create_clip_optimizer(variables["params"], lr=0.02,
                               max_iters=STEPS + 2)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, loss_fn=clip_psp_loss, donate=False)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(STEPS):
        state, metrics = step_fn(state, pool[i % len(pool)], key)
        losses.append(float(metrics["loss"]))
    return np.asarray(losses)


def test_bf16_drift_bounded():
    enc = ModelBuilder.build_encoder("resnet18dilated", fc_dim=512)
    model = ClipPSP(encoder=enc, num_class=NUM_CLASS, fc_dim=512)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((T, 1, HW, HW, 3), jnp.float32), train=True)

    rng = np.random.default_rng(0)
    pool = []
    for _ in range(4):
        imgs = rng.standard_normal((T, B, HW, HW, 3)).astype(np.float32)
        labels = rng.integers(-1, NUM_CLASS, (T, B, HW, HW)).astype(np.int32)
        pool.append({"img": jnp.asarray(imgs), "labels": jnp.asarray(labels)})

    loss_f32 = _run(None, variables, pool)
    loss_bf16 = _run(jnp.bfloat16, variables, pool)

    rel = np.abs(loss_bf16 - loss_f32) / np.maximum(np.abs(loss_f32), 1e-8)
    # bf16 has ~3 decimal digits; per-step loss agreement within a few
    # percent over a 12-step trajectory means no compounding divergence.
    assert rel.max() < 0.05, (rel, loss_f32, loss_bf16)
    # and the trajectory actually trains (both decrease from the start)
    assert loss_f32[-1] < loss_f32[0]
    assert loss_bf16[-1] < loss_bf16[0]
