"""Train-step ablation matrix on the real TPU (VERDICT r2 item 3).

The round-2 bench measured the training step ONE execution at a time with a
per-step scalar readback; through the axon tunnel that folds a ~30-40 ms
host round trip into every sample (ROADMAP "Tunnel measurement floor").
Production training dispatches steps back-to-back and reads metrics
asynchronously, so the honest per-step time is K chained donated steps with
a single readback at the end — exactly what this tool measures, alongside
the levers VERDICT r2 item 3 names:

  * single        — the old 1-step-with-readback measurement (for delta)
  * chained       — K donated steps, one readback (production-faithful)
  * fwd_only      — loss value only, no grad/update (fwd:bwd split)
  * crop480/512   — even/MXU-aligned crops vs the recipe's 479
  * rbg_prng      — faster TPU PRNG for dropout masks (--rbg flag; the
                    impl must be set before any RNG use)

Usage:  python tools/train_ablate.py [--steps 8] [--trials 3] [--rbg]
        [--netwarp]   (netwarp chained-step measurement, K=4)
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
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--rbg", action="store_true")
    ap.add_argument("--netwarp", action="store_true")
    ap.add_argument("--netwarp_parts", action="store_true")
    ap.add_argument("--netwarp_iters", type=int, nargs="+", default=[20])
    ap.add_argument("--crops", type=int, nargs="+", default=[479, 480, 512])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import (ClipPSP,
                                                             clip_psp_loss)
    from cvpr2021_vspw_implement_tpu.parallel import (TrainState,
                                                      make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    dev = jax.devices()[0]
    peak = 197e12 if "v5 lite" in dev.device_kind.lower() else 197e12
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    rows = []

    def flops_of(compiled):
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca["flops"])
        except Exception:
            return None

    def setup(crop, tb=4, bb=2):
        enc = ModelBuilder.build_encoder("resnet101dilated",
                                         dtype=jnp.bfloat16)
        model = ClipPSP(encoder=enc, num_class=124, fc_dim=2048,
                        dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            tvars = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                               train=True)
        tvars = jax.device_put(tvars, dev)
        tx = create_clip_optimizer(tvars["params"], lr=0.002, max_iters=100)
        state = TrainState.create(tvars, tx)
        imgs = jnp.asarray(
            rng.standard_normal((tb, bb, crop, crop, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 124, (tb, bb, crop, crop)),
                             jnp.int32)
        return model, tx, state, {"img": imgs, "labels": labels}

    def measure_chained(step_fn, state, batch, k):
        """k donated steps, single readback; returns (ms/step, final_state)."""
        # warm: one step (compile) + readback
        state, m = step_fn(state, batch, key)
        float(m["loss"])
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            losses = []
            for _i in range(k):
                state, m = step_fn(state, batch, key)
                losses.append(m["loss"])
            float(jnp.sum(jnp.stack(losses)))
            best = min(best, (time.perf_counter() - t0) / k)
        return best * 1e3, state

    if args.netwarp_parts:
        # decomposition of the netwarp train step at the recipe shape
        # (b=2, 479²): standalone RAFT fwd, encoder fwd+bwd at the 2B=4
        # concat batch, and the netwarp fwd-only loss — all chained k=4
        # with one readback, same as the step measurements
        from cvpr2021_vspw_implement_tpu.models.netwarp import (NetWarp,
                                                                netwarp_loss)
        from cvpr2021_vspw_implement_tpu.models.raft import (
            RAFT, pad_to_multiple_of_8)
        crop, k = 479, 4
        nimgs = jnp.asarray(
            rng.standard_normal((2, 2, crop, crop, 3)).astype(np.float32))
        nlabels = jnp.asarray(rng.integers(0, 124, (2, 2, crop, crop)),
                              jnp.int32)

        def chained(fn, *inputs):
            out = fn(*inputs)
            float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                vals = []
                for _i in range(k):
                    out = fn(*inputs)
                    out = out[0] if isinstance(out, tuple) else out
                    vals.append(jnp.sum(out.astype(jnp.float32)))
                float(jnp.sum(jnp.stack(vals)))
                best = min(best, (time.perf_counter() - t0) / k)
            return best * 1e3

        # RAFT standalone fwd (as inside _flow: padded, test_mode)
        raft = RAFT(iters=20, dtype=jnp.bfloat16)
        pad_t, _ = pad_to_multiple_of_8((nimgs[1] + 1.0) * 127.5)
        pad_p, _ = pad_to_multiple_of_8((nimgs[0] + 1.0) * 127.5)
        with jax.default_device(jax.devices("cpu")[0]):
            rvars = raft.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3), jnp.float32),
                              jnp.zeros((1, 64, 64, 3), jnp.float32))
        rvars = jax.device_put(rvars, dev)
        raft_fwd = jax.jit(lambda a, b: raft.apply(rvars, a, b,
                                                   test_mode=True)[1])
        print(json.dumps({"config": "raft_fwd_i20_b2_480p",
                          "ms": round(chained(raft_fwd, pad_t, pad_p), 2)}),
              flush=True)
        raft1 = RAFT(iters=1, dtype=jnp.bfloat16)
        raft1_fwd = jax.jit(lambda a, b: raft1.apply(rvars, a, b,
                                                     test_mode=True)[1])
        print(json.dumps({"config": "raft_fwd_i1_b2_480p",
                          "ms": round(chained(raft1_fwd, pad_t, pad_p), 2)}),
              flush=True)

        # encoder fwd+bwd at the 2B=4 concat batch
        enc = ModelBuilder.build_encoder("resnet101dilated",
                                         dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            evars = enc.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3), jnp.float32),
                             train=True)
        evars = jax.device_put(evars, dev)
        enc_in = jnp.concatenate([nimgs[1], nimgs[0]], axis=0)

        def enc_loss(p, x):
            outs, _ = enc.apply({"params": p,
                                 "batch_stats": evars["batch_stats"]},
                                x, train=True, mutable=["batch_stats"])
            return jnp.sum(outs[-1].astype(jnp.float32) ** 2) * 1e-6

        enc_fwd = jax.jit(lambda x: enc.apply(
            {"params": evars["params"],
             "batch_stats": evars["batch_stats"]},
            x, train=True, mutable=["batch_stats"])[0][-1])
        enc_fwdbwd = jax.jit(lambda x: jax.tree_util.tree_leaves(
            jax.grad(enc_loss)(evars["params"], x))[0])
        print(json.dumps({"config": "encoder_fwd_b4",
                          "ms": round(chained(enc_fwd, enc_in), 2)}),
              flush=True)
        print(json.dumps({"config": "encoder_fwdbwd_b4",
                          "ms": round(chained(enc_fwdbwd, enc_in), 2)}),
              flush=True)

        # netwarp fwd-only loss
        enc2 = ModelBuilder.build_encoder("resnet101dilated",
                                          dtype=jnp.bfloat16)
        nmodel = NetWarp(encoder=enc2, num_class=124, fc_dim=2048,
                         raft_iters=20, dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            nvars = nmodel.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                jnp.zeros((2, 1, 64, 64, 3), jnp.float32),
                                train=True)
        nvars = jax.device_put(nvars, dev)
        batch = {"img": nimgs, "labels": nlabels}

        def nw_fwd(kk):
            outs, _ = nmodel.apply(
                {"params": nvars["params"],
                 "batch_stats": nvars["batch_stats"]},
                nimgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": kk})
            loss, _ = netwarp_loss(outs, batch)
            return loss
        nw_fwd_j = jax.jit(nw_fwd)
        print(json.dumps({"config": "netwarp_fwd_only",
                          "ms": round(chained(nw_fwd_j, key), 2)}),
              flush=True)
        return

    if args.netwarp:
        from cvpr2021_vspw_implement_tpu.models.netwarp import (NetWarp,
                                                                netwarp_loss)
        crop = 479
        nimgs = jnp.asarray(
            rng.standard_normal((2, 2, crop, crop, 3)).astype(np.float32))
        nlabels = jnp.asarray(rng.integers(0, 124, (2, 2, crop, crop)),
                              jnp.int32)
        for iters in args.netwarp_iters:
            enc = ModelBuilder.build_encoder("resnet101dilated",
                                             dtype=jnp.bfloat16)
            nmodel = NetWarp(encoder=enc, num_class=124, fc_dim=2048,
                             raft_iters=iters, dtype=jnp.bfloat16)
            with jax.default_device(jax.devices("cpu")[0]):
                nvars = nmodel.init({"params": jax.random.PRNGKey(0),
                                     "dropout": jax.random.PRNGKey(1)},
                                    jnp.zeros((2, 1, 64, 64, 3),
                                              jnp.float32), train=True)
            nvars = jax.device_put(nvars, dev)
            ntx = create_clip_optimizer(nvars["params"], lr=0.002,
                                        max_iters=100)
            nstate = TrainState.create(nvars, ntx)
            nstep = make_train_step(nmodel, ntx, loss_fn=netwarp_loss,
                                    donate=True)
            ms, _ = measure_chained(nstep, nstate,
                                    {"img": nimgs, "labels": nlabels}, k=4)
            print(json.dumps({"config": f"netwarp_chained_k4 iters={iters}",
                              "ms_per_step": round(ms, 2)}), flush=True)
        return

    for crop in args.crops:
        model, tx, state, batch = setup(crop)

        if crop == args.crops[0]:
            # old method: one step per trial, readback inside the timing
            sf = make_train_step(model, tx, loss_fn=clip_psp_loss,
                                 donate=False)
            _, m = sf(state, batch, key)
            float(m["loss"])
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                _, m = sf(state, batch, key)
                float(m["loss"])
                best = min(best, time.perf_counter() - t0)
            fl = flops_of(jax.jit(lambda s, b, k: sf(s, b, k))
                          .lower(state, batch, key).compile())
            rows.append({"config": f"single_readback crop={crop}",
                         "ms_per_step": round(best * 1e3, 2),
                         "mfu": round(fl / best / peak, 4) if fl else None})

            # fwd-only at the recipe crop
            def fwd_loss(state, batch, k):
                outs, _ = model.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    batch["img"], train=True, mutable=["batch_stats"],
                    rngs={"dropout": k})
                loss, _ = clip_psp_loss(outs, batch)
                return loss
            fwd_j = jax.jit(fwd_loss)
            float(fwd_j(state, batch, key))
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                vals = [fwd_j(state, batch, key) for _i in range(args.steps)]
                float(jnp.sum(jnp.stack(vals)))
                best = min(best, (time.perf_counter() - t0) / args.steps)
            rows.append({"config": f"fwd_only_chained crop={crop}",
                         "ms_per_step": round(best * 1e3, 2)})

        step_fn = make_train_step(model, tx, loss_fn=clip_psp_loss,
                                  donate=True)
        fl = None
        try:
            sf2 = make_train_step(model, tx, loss_fn=clip_psp_loss,
                                  donate=False)
            fl = flops_of(jax.jit(lambda s, b, k: sf2(s, b, k))
                          .lower(state, batch, key).compile())
        except Exception:
            pass
        ms, state = measure_chained(step_fn, state, batch, args.steps)
        rows.append({
            "config": f"chained_k{args.steps} crop={crop}"
                      + (" rbg" if args.rbg else ""),
            "ms_per_step": round(ms, 2),
            "mfu": round(fl / (ms / 1e3) / peak, 4) if fl else None})
        for r in rows:
            print(json.dumps(r), flush=True)
        rows = []


if __name__ == "__main__":
    main()
