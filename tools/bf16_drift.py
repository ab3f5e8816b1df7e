"""Measure bf16-vs-f32 per-step loss drift of the jitted train step.

The production recipe runs the flagship (TCB-PSP / clip_psp) training step
in bfloat16 compute (params stay f32); the parity evidence
(tests/test_curve_parity*.py) runs f32.  This tool closes the gap: it runs
the SAME seeded synthetic training trajectory twice — once with
``dtype=bfloat16`` models and once with ``dtype=f32`` — from identical f32
parameter initialisation, and reports the per-step loss drift over N steps.
The measured bound is recorded in PARITY.md (reference trajectory
semantics: /root/reference/train_clip2.py:26-126).

Usage:  python tools/bf16_drift.py [--steps 100] [--crop 241] [--batch 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--crop", type=int, default=241)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--clip_num", type=int, default=4,
                    help="context frames + 1 target (flagship recipe: 4)")
    ap.add_argument("--num_class", type=int, default=124)
    ap.add_argument("--dtype", choices=["both", "bf16", "f32"],
                    default="both",
                    help="run only one side (trace hunting) or both (drift)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import (ClipPSP,
                                                             clip_psp_loss)
    from cvpr2021_vspw_implement_tpu.parallel.optim import \
        create_clip_optimizer
    from cvpr2021_vspw_implement_tpu.parallel.train_state import (
        TrainState, make_train_step)

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    def build(dtype):
        enc = ModelBuilder.build_encoder("resnet101dilated", fc_dim=2048,
                                         dtype=dtype)
        return ClipPSP(encoder=enc, num_class=args.num_class, fc_dim=2048,
                       dtype=dtype)

    model_f32 = build(None)
    model_bf16 = build(jnp.bfloat16)

    # one f32 init shared by both runs (params are f32 either way; only the
    # compute dtype differs)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model_f32.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((args.clip_num, 1, 64, 64, 3), jnp.float32), train=True)
    variables = jax.device_put(variables, dev)

    # seeded synthetic batches: a fixed pool cycled so both runs see
    # bit-identical inputs in the same order
    rng = np.random.default_rng(0)
    pool = []
    for _ in range(8):
        imgs = rng.standard_normal(
            (args.clip_num, args.batch, args.crop, args.crop, 3)
        ).astype(np.float32)
        labels = rng.integers(
            -1, args.num_class, (args.clip_num, args.batch, args.crop,
                                 args.crop)).astype(np.int32)
        pool.append({"img": jnp.asarray(imgs), "labels": jnp.asarray(labels)})

    def run(model):
        tx = create_clip_optimizer(variables["params"], lr=0.002,
                                   max_iters=args.steps)
        state = TrainState.create(variables, tx)
        step_fn = make_train_step(model, tx, loss_fn=clip_psp_loss,
                                  donate=False)
        key = jax.random.PRNGKey(0)
        losses = []
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step_fn(state, pool[i % len(pool)], key)
            losses.append(float(metrics["loss"]))
            if not np.isfinite(losses[-1]):
                print(f"step {i}: loss {losses[-1]} (first non-finite; "
                      f"prev {losses[-6:-1]})", file=sys.stderr, flush=True)
        wall = time.perf_counter() - t0
        print("loss trace:", " ".join(f"{l:.4f}" for l in losses),
              file=sys.stderr, flush=True)
        return np.asarray(losses), state, wall

    if args.dtype != "both":
        run(model_bf16 if args.dtype == "bf16" else model_f32)
        return

    loss_f32, state_f32, wall_f32 = run(model_f32)
    loss_bf16, state_bf16, wall_bf16 = run(model_bf16)

    rel = np.abs(loss_bf16 - loss_f32) / np.maximum(np.abs(loss_f32), 1e-8)
    # parameter drift at the end of the trajectory (relative L2 over leaves)
    leaves32 = jax.tree_util.tree_leaves(state_f32.params)
    leaves16 = jax.tree_util.tree_leaves(state_bf16.params)
    num = float(sum(jnp.sum((a - b) ** 2) for a, b in zip(leaves32, leaves16)))
    den = float(sum(jnp.sum(a ** 2) for a in leaves32))
    param_rel_l2 = (num / max(den, 1e-30)) ** 0.5

    out = {
        "steps": args.steps,
        "shape": f"T={args.clip_num} B={args.batch} {args.crop}x{args.crop}",
        "loss_rel_drift_max": round(float(rel.max()), 6),
        "loss_rel_drift_mean": round(float(rel.mean()), 6),
        "loss_rel_drift_last10_max": round(float(rel[-10:].max()), 6),
        "final_loss_f32": round(float(loss_f32[-1]), 6),
        "final_loss_bf16": round(float(loss_bf16[-1]), 6),
        "param_rel_l2_drift": round(param_rel_l2, 6),
        "wall_f32_s": round(wall_f32, 1),
        "wall_bf16_s": round(wall_bf16, 1),
        "device": dev.device_kind,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
