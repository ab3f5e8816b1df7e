"""Eval-shape policy measurement: exact-compile-per-width vs width-bucketed
masked kernels for the flagship TCB-PSP streaming eval (VERDICT r4 #1).

VSPW val videos have constant per-video shapes drawn from a handful of
distinct widths; the bucketed-masked path (ops/masked.py) pays a measured
~29% per-frame tax to share one kernel per 64-px bucket, while exact-shape
kernels pay one XLA compile per distinct width (amortized across every
video of that width and — via the persistent compile cache — across runs).

This micro measures, per width in a realistic mix:
  * exact compile wall time (cold = first lower+compile; warm = persistent
    cache hit, re-lowered in a fresh executable namespace),
  * exact per-frame streaming time,
  * bucketed per-frame streaming time (one kernel per bucket),
and prints the break-even frame count: a shape with more total frames than
this across the val list should compile exact.

Run on the real TPU: `timeout 4000 python tools/eval_policy_micro.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder  # noqa: E402
from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP  # noqa: E402
from cvpr2021_vspw_implement_tpu.models.segmentation import (  # noqa: E402
    inference_pred, inference_pred_rt)
from cvpr2021_vspw_implement_tpu.ops.masked import (  # noqa: E402
    bucket_hw, feature_valid)

H = 480
WIDTHS = (640, 704, 736, 800, 853, 912)
N = 32          # frames per timed scan
TRIALS = 3


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    enc = ModelBuilder.build_encoder("resnet101dilated", dtype=jnp.bfloat16)
    model = ClipPSP(encoder=enc, num_class=124, fc_dim=2048,
                    dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                               train=False)
    variables = jax.device_put(variables, dev)
    pooled0 = [jnp.zeros((1, s, s, 2048), jnp.bfloat16) for s in (1, 2, 3, 6)]

    def exact_run_fn(h, w):
        def step(blended_prev, img):
            c5, pooled = model.apply(variables, img, train=False,
                                     method=model.encode_frame)
            blended = [jnp.mean(jnp.stack([p, q]), 0)
                       for p, q in zip(pooled, blended_prev)]
            logits = model.apply(variables, c5, blended, train=False,
                                 method=model.fuse_target)
            pred = inference_pred((logits,), (h, w))
            return pooled, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))

        def run(frames, blended0):
            carry, sums = jax.lax.scan(step, blended0, frames)
            return jnp.sum(sums)
        return run

    def bucket_run_fn(hp, wp):
        def step_outer(frames_p, blended0, hv, wv):
            def step(blended_prev, img):
                c5, pooled = model.apply(variables, img, train=False,
                                         valid_hw=(hv, wv),
                                         method=model.encode_frame)
                blended = [jnp.mean(jnp.stack([p, q]), 0)
                           for p, q in zip(pooled, blended_prev)]
                fv = feature_valid(c5.shape[1], c5.shape[2], (hv, wv),
                                   (hp, wp))
                logits = model.apply(variables, c5, blended, train=False,
                                     feat_valid=fv,
                                     method=model.fuse_target)
                pred = inference_pred_rt((logits,), (hp, wp), fv, (hv, wv))
                return pooled, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))
            carry, sums = jax.lax.scan(step, blended0, frames_p)
            return jnp.sum(sums)
        return step_outer

    rows = []
    bucket_cache = {}
    for w in WIDTHS:
        frames = jnp.asarray(
            rng.standard_normal((N, 1, H, w, 3)).astype(np.float32))

        # exact: compile (wall) + per-frame
        t0 = time.perf_counter()
        cfun = jax.jit(exact_run_fn(H, w)).lower(frames, pooled0).compile()
        compile_s = time.perf_counter() - t0
        float(cfun(frames, pooled0))
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(cfun(frames, pooled0))
            best = min(best, time.perf_counter() - t0)
        exact_ms = best / N * 1e3

        # bucketed: one kernel per bucket, shared across widths
        hp, wp = bucket_hw(H, w)
        frames_p = jnp.pad(frames, ((0, 0), (0, 0), (0, hp - H),
                                    (0, wp - w), (0, 0)))
        bk = bucket_cache.get((hp, wp))
        bcompile_s = 0.0
        if bk is None:
            t0 = time.perf_counter()
            bk = jax.jit(bucket_run_fn(hp, wp)).lower(
                frames_p, pooled0, jnp.int32(H), jnp.int32(w)).compile()
            bcompile_s = time.perf_counter() - t0
            bucket_cache[(hp, wp)] = bk
        float(bk(frames_p, pooled0, jnp.int32(H), jnp.int32(w)))
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(bk(frames_p, pooled0, jnp.int32(H), jnp.int32(w)))
            best = min(best, time.perf_counter() - t0)
        bk_ms = best / N * 1e3

        overhead = bk_ms / exact_ms - 1
        saving_ms = bk_ms - exact_ms
        breakeven = compile_s * 1e3 / saving_ms if saving_ms > 0 else None
        rows.append(dict(width=w, bucket=f"{hp}x{wp}",
                         exact_compile_s=round(compile_s, 1),
                         bucket_compile_s=round(bcompile_s, 1),
                         exact_ms=round(exact_ms, 2),
                         bucket_ms=round(bk_ms, 2),
                         overhead_pct=round(overhead * 100, 1),
                         breakeven_frames=round(breakeven)
                         if breakeven else None))
        print(json.dumps(rows[-1]), flush=True)
        del frames, frames_p

    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
