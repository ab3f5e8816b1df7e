"""Attribute the flagship training step's 51.5% MFU (VERDICT r4 #2).

Times the TCB-PSP R101 train step's stages in isolation on the chip, at
the exact bench shape (T+1=4 x B=2 x 479x479, bf16 compute, f32
params/BN, no remat), same donated-chain dispatch as the bench row:

  enc_fwd    - encoder trunk forward on the flattened (T+1)B frames
  fwd        - full forward + loss (train=True, BN batch stats)
  fwd_bwd    - + backward (value_and_grad, no optimizer)
  sgd        - optimizer-only (4-group SGD update on precomputed grads)
  full       - the shipped train step (fwd+bwd+BN-stat update+SGD)

and reports each stage's XLA flop count, bytes accessed, implied MFU and
arithmetic intensity, so the 92 ms step splits into measured components:
bwd = fwd_bwd - fwd, residual = full - fwd_bwd - sgd (BN-stat writes +
dispatch).  Prints one JSON line.

Run on the real TPU: `timeout 4000 python tools/train_micro.py`.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import (ClipPSP,
                                                             clip_psp_loss)
    from cvpr2021_vspw_implement_tpu.parallel import (TrainState,
                                                      make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    dev = jax.devices()[0]
    peak = 197e12
    rng = np.random.default_rng(0)

    enc = ModelBuilder.build_encoder("resnet101dilated", dtype=jnp.bfloat16)
    model = ClipPSP(encoder=enc, num_class=124, fc_dim=2048,
                    dtype=jnp.bfloat16)

    tb, bb, crop = 4, 2, 479
    imgs = jnp.asarray(
        rng.standard_normal((tb, bb, crop, crop, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 124, (tb, bb, crop, crop)),
                         jnp.int32)
    batch = {"img": imgs, "labels": labels}
    with jax.default_device(jax.devices("cpu")[0]):
        tvars = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                           train=True)
    tvars = jax.device_put(tvars, dev)
    tx = create_clip_optimizer(tvars["params"], lr=0.002, max_iters=100)
    state = TrainState.create(tvars, tx)
    key = jax.random.PRNGKey(0)

    def loss_value(params, bstats, batch, key):
        outs, mut = model.apply(
            {"params": params, "batch_stats": bstats}, batch["img"],
            train=True, mutable=["batch_stats"], rngs={"dropout": key})
        loss, acc = clip_psp_loss(outs, batch)
        return loss

    flat = imgs.reshape(tb * bb, crop, crop, 3)

    def enc_fwd(params, bstats, flat):
        feats = model.encoder.apply(
            {"params": params["encoder"],
             "batch_stats": bstats.get("encoder", {})}, flat, train=True,
            mutable=["batch_stats"])[0]
        return jnp.sum(feats[-1][:, ::31, ::31].astype(jnp.float32))

    grads0 = jax.jit(jax.grad(loss_value))(state.params, state.batch_stats,
                                           batch, key)
    opt_state0 = state.opt_state

    def sgd_only(grads, opt_state, params):
        import optax
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    step_fn = make_train_step(model, tx, loss_fn=clip_psp_loss, donate=False)

    def tree_sum(t):
        """Full reduction over every leaf — keeps XLA from dead-code-
        eliminating the computation that produced the tree."""
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(t))

    def fwd_bwd(p, s, b, k):
        loss, grads = jax.value_and_grad(loss_value)(p, s, b, k)
        return loss + 0.0 * tree_sum(grads)

    def sgd_scalar(g, o, p):
        new_p, _new_o = sgd_only(g, o, p)
        return tree_sum(new_p)

    stages = {
        "enc_fwd": (enc_fwd, (state.params, state.batch_stats, flat)),
        "fwd": (loss_value, (state.params, state.batch_stats, batch, key)),
        "fwd_bwd": (fwd_bwd, (state.params, state.batch_stats, batch, key)),
        "sgd": (sgd_scalar, (grads0, opt_state0, state.params)),
    }

    out = {"metric": "train_step_attribution",
           "shape": "T+1=4 x B=2 x 479x479 bf16", "peak_tflops": 197.0}

    CHAIN = 8

    def timed(fn, args, tag):
        # Chained timing: CHAIN async dispatches, ONE readback.  A single
        # dispatch+readback through the axon tunnel costs ~29 ms (measured:
        # bench train_step_single_readback_ms 121.1 vs 8-step chain 92.3),
        # which would dominate every stage number; async dispatch hides it.
        jfn = jax.jit(fn)
        r = jfn(*args)
        float(jnp.sum(r) if hasattr(r, "ndim") else r)
        best1 = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = jfn(*args)
            float(jnp.sum(r) if hasattr(r, "ndim") else r)
            best1 = min(best1, time.perf_counter() - t0)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                r = jfn(*args)
            float(jnp.sum(r) if hasattr(r, "ndim") else r)
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        out[tag + "_dispatch_ms"] = round(best1 * 1e3, 2)
        fl = by = None
        try:
            ca = jfn.lower(*args).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            fl = ca.get("flops")
            by = ca.get("bytes accessed")
        except Exception:
            pass
        out[tag + "_ms"] = round(best * 1e3, 2)
        out[tag + "_gflops"] = round(fl / 1e9, 1) if fl else None
        out[tag + "_mfu"] = round(fl / best / peak, 4) if fl else None
        out[tag + "_gbytes"] = round(by / 1e9, 2) if by else None
        out[tag + "_ai"] = round(fl / by, 1) if fl and by else None
        print(f"{tag}: {best*1e3:.2f} ms, {(fl or 0)/1e9:.0f} GF, "
              f"MFU {(fl or 0)/best/peak:.3f}, "
              f"{(by or 0)/1e9:.2f} GB", flush=True)
        return best

    for tag, (fn, args) in stages.items():
        timed(fn, args, tag)

    # the shipped full step (fwd+bwd+BN-stat+SGD), chained like the bench
    new_state, metrics = step_fn(state, batch, key)
    float(metrics["loss"])
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        st = state
        for _ in range(CHAIN):
            st, metrics = step_fn(st, batch, key)
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    out["full_ms"] = round(best * 1e3, 2)

    out["bwd_ms"] = round(out["fwd_bwd_ms"] - out["fwd_ms"], 2)
    out["residual_ms"] = round(out["full_ms"] - out["fwd_bwd_ms"]
                               - out["sgd_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
