"""Prediction-upsample formulation shootout (serve_micro follow-up).

VERDICT (v5e, measured): the MXU matmul resize WINS — 0.640 ms/frame vs
1.67 ms for the 2-tap static-gather formulation and 0.989 ms for the
HIGHEST-precision matmul; gathers lose to dense MXU contractions on TPU
even at a 50x FLOP disadvantage (same conclusion as the round-3 RAFT
corr lookup).  The mismatch counter also quantifies the precision
story: default-precision MXU interpolation flips 179,489 / 26,204,160
(0.69%) argmax pixels vs the exact-f32 oracle on random near-tie
logits; HIGHEST flips 5 (2e-7, pure tie-ulp noise).  Production stays
on the fast default (the bf16 trunk dominates end-to-end drift);
``inference_pred(precision=...)`` exposes the exact mode.

The serving step ends with ``inference_pred``: bilinear-upsample the
[1, 60, 107, 124] f32 logits to 480x853 and argmax (reference semantics:
test.py:66-70 argmaxes an F.interpolate'd score volume).  The matmul
formulation (ops/interpolate.py::resize_bilinear) runs a dense
[853, 107] MXU contraction per row — 10.9 GF — and XLA materializes the
203 MB full-resolution f32 volume between the dot and the argmax.  The
2-tap static-gather formulation (resize_bilinear_taps) computes the same
lerp with ~0.2 GF and lets XLA fuse taps + lerp + argmax into one loop
that writes only the uint8 mask.

Measures, in a 64-frame ``lax.scan`` (the bench dispatch regime —
single chained dispatches through the axon tunnel cost ~3-4 ms wall
regardless of size):

  pred_matmul — argmax(matmul-resize)   (shipped path before this micro)
  pred_taps   — argmax(taps-resize)
  probs_taps  — softmax(taps-resize) summed (the test_all use-case;
                the full volume must materialize here, taps still skips
                the dense dot)

plus an on-chip argmax-equality count between the two pred formulations
over all 64 random-logit frames (ties at f32 ulp differences are the
only way they can diverge; a handful of tie pixels would still print
here rather than hide).

Run on the real TPU: `timeout 1800 python tools/pred_micro.py`.
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

    from cvpr2021_vspw_implement_tpu.ops.interpolate import (
        resize_bilinear, resize_bilinear_taps)

    rng = np.random.default_rng(0)
    N = 64
    logits = jnp.asarray(
        rng.standard_normal((N, 1, 60, 107, 124)).astype(np.float32))
    size = (480, 853)

    def resize_hp(x, size):
        with jax.default_matmul_precision("highest"):
            return resize_bilinear(x, size)

    bodies = {
        "pred_matmul_hp": lambda x: jnp.sum(
            jnp.argmax(resize_hp(x, size), -1).astype(jnp.uint8)
            [:, ::97, ::97].astype(jnp.int32)).astype(jnp.float32),
        "pred_matmul": lambda x: jnp.sum(
            jnp.argmax(resize_bilinear(x, size), -1).astype(jnp.uint8)
            [:, ::97, ::97].astype(jnp.int32)).astype(jnp.float32),
        "pred_taps": lambda x: jnp.sum(
            jnp.argmax(resize_bilinear_taps(x, size), -1).astype(jnp.uint8)
            [:, ::97, ::97].astype(jnp.int32)).astype(jnp.float32),
        "probs_taps": lambda x: jnp.sum(
            jax.nn.softmax(resize_bilinear_taps(x, size), -1)
            [:, ::97, ::97, ::31]),
        "probs_matmul": lambda x: jnp.sum(
            jax.nn.softmax(resize_bilinear(x, size), -1)
            [:, ::97, ::97, ::31]),
    }

    out = {"metric": "pred_upsample_micro",
           "shape": "60x107x124 f32 -> 480x853, 64-frame scan"}
    for tag, body in bodies.items():
        @jax.jit
        def run(xs, _body=body):
            def step(c, x):
                return c, _body(x)
            _, sums = jax.lax.scan(step, 0.0, xs)
            return jnp.sum(sums)

        s = run(logits)
        float(s)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            s = run(logits)
            float(s)
            best = min(best, (time.perf_counter() - t0) / N)
        out[tag + "_ms"] = round(best * 1e3, 3)
        print(f"{tag}: {best*1e3:.3f} ms/frame", flush=True)

    @jax.jit
    def mismatch(xs):
        def step(c, x):
            a = jnp.argmax(resize_bilinear(x, size), -1)
            b = jnp.argmax(resize_bilinear_taps(x, size), -1)
            h = jnp.argmax(resize_hp(x, size), -1)
            return (c[0] + jnp.sum((a != b).astype(jnp.int32)),
                    c[1] + jnp.sum((h != b).astype(jnp.int32))), 0.0
        c, _ = jax.lax.scan(step, (jnp.int32(0), jnp.int32(0)), xs)
        return c

    mm, mm_hp = (int(v) for v in mismatch(logits))
    out["argmax_mismatch_px"] = mm
    out["argmax_mismatch_hp_vs_f32taps_px"] = mm_hp
    out["total_px"] = N * size[0] * size[1]
    print(f"argmax mismatches: default {mm}, highest {mm_hp} "
          f"/ {N*size[0]*size[1]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
