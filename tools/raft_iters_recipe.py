"""EPE-vs-iterations evidence for the ``TPU.raft_iters`` recipe knob.

The reference runs the frozen RAFT inside NetWarp/ETC at 20 refinement
iterations (net_warp.py's raft call; RAFT demo default).  Fewer iterations
cut the netwarp train step's sequential GRU chain proportionally, at some
flow-accuracy cost.  No pretrained RAFT weights exist in this environment
(zero egress), so the curve is measured on a *learnable synthetic warp
task*: smooth random textures warped by random affine flows (ground truth
exact by construction), RAFT trained from scratch for a few hundred
chairs-stage steps, then held-out EPE swept over iteration counts.  The
shape of the curve (convergence of the iterative refinement) is the
evidence; absolute EPEs are task-specific.

Usage:  python tools/raft_iters_recipe.py [--steps 400] [--out out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

# this image's sitecustomize force-registers the axon TPU plugin; the env
# var alone does not stick — override the config after import (conftest.py
# does the same for the test suite)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def smooth_texture(rng, b, h, w, scale=8):
    """Low-frequency random RGB texture in [0, 255]."""
    lo = rng.standard_normal((b, h // scale + 2, w // scale + 2, 3))
    from cvpr2021_vspw_implement_tpu.ops.interpolate import resize_bilinear
    x = resize_bilinear(jnp.asarray(lo, jnp.float32), (h, w),
                        align_corners=True)
    x = x - x.min(axis=(1, 2, 3), keepdims=True)
    x = x / (x.max(axis=(1, 2, 3), keepdims=True) + 1e-6)
    return x * 255.0


def affine_flow(rng, b, h, w, max_shift=6.0, max_lin=0.02):
    """Per-sample random affine flow field f(p) = A p + t, [B, H, W, 2]."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    p = jnp.stack([xs - w / 2, ys - h / 2], -1)  # centered (x, y)
    A = rng.uniform(-max_lin, max_lin, (b, 2, 2)).astype(np.float32)
    t = rng.uniform(-max_shift, max_shift, (b, 2)).astype(np.float32)
    return (jnp.einsum("hwc,bdc->bhwd", p, jnp.asarray(A))
            + jnp.asarray(t)[:, None, None, :])


def make_batch(rng, b, h, w):
    """(img1, img2, flow, valid): img1 = backward-warp of img2 by flow, so
    RAFT's convention img1(p) == img2(p + flow(p)) holds exactly."""
    from cvpr2021_vspw_implement_tpu.ops.warp import flowwarp
    img2 = smooth_texture(rng, b, h, w)
    flow = affine_flow(rng, b, h, w)
    img1 = flowwarp(img2, flow)
    # exclude pixels whose source fell outside img2 (zero-filled)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = xs[None] + flow[..., 0]
    sy = ys[None] + flow[..., 1]
    valid = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))
    return {"img1": img1, "img2": img2, "flow": flow,
            "valid": valid.astype(jnp.float32)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--size", type=int, nargs=2, default=[96, 128])
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--iters_train", type=int, default=12)
    ap.add_argument("--iters_sweep", type=int, nargs="+",
                    default=[1, 2, 4, 8, 12, 16, 20, 32])
    ap.add_argument("--val_pairs", type=int, default=16)
    ap.add_argument("--out", default="/tmp/raft_iters_recipe.json")
    args = ap.parse_args()

    from cvpr2021_vspw_implement_tpu.models.raft.raft import RAFT
    from cvpr2021_vspw_implement_tpu.models.raft.training import (
        make_flow_optimizer, make_flow_train_step_bn)

    h, w = args.size
    rng = np.random.default_rng(0)
    model = RAFT(iters=args.iters_train)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3), jnp.float32),
                           jnp.zeros((1, h, w, 3), jnp.float32), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = make_flow_optimizer(lr=args.lr, num_steps=args.steps)
    opt_state = tx.init(params)
    step = make_flow_train_step_bn(model, tx)

    t0 = time.perf_counter()
    loss0 = lossN = None
    for i in range(args.steps):
        batch = make_batch(rng, args.batch, h, w)
        params, batch_stats, opt_state, metrics = step(
            params, batch_stats, opt_state, batch)
        if i % 50 == 0 or i == args.steps - 1:
            lossN = float(metrics["loss"])
            if loss0 is None:
                loss0 = lossN
            print(f"step {i}: loss {lossN:.3f} "
                  f"epe {float(metrics['epe']):.3f}", flush=True)
    train_s = time.perf_counter() - t0

    trained = {"params": params, "batch_stats": batch_stats}
    vrng = np.random.default_rng(123)
    val = [make_batch(vrng, 1, h, w) for _ in range(args.val_pairs)]

    curve = {}
    ms = {}
    for k in args.iters_sweep:
        mk = RAFT(iters=k)

        @jax.jit
        def infer(i1, i2, mk=mk):
            _, flow = mk.apply(trained, i1, i2, test_mode=True)
            return flow

        epes = []
        infer(val[0]["img1"], val[0]["img2"]).block_until_ready()
        t0 = time.perf_counter()
        for b in val:
            f = infer(b["img1"], b["img2"])
            e = jnp.sqrt(jnp.sum((f - b["flow"]) ** 2, -1))
            epes.append(float((e * b["valid"]).sum() / b["valid"].sum()))
        # scalar readbacks above force completion (axon tunnel safe)
        ms[k] = round((time.perf_counter() - t0) / len(val) * 1e3, 2)
        curve[k] = round(float(np.mean(epes)), 4)
        print(f"iters={k}: epe {curve[k]:.4f}  ({ms[k]} ms/pair)",
              flush=True)

    out = {"task": f"synthetic affine warp {h}x{w}",
           "train_steps": args.steps, "train_iters": args.iters_train,
           "train_s": round(train_s, 1), "loss_first": loss0,
           "loss_last": lossN, "epe_vs_iters": curve, "ms_vs_iters": ms}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
