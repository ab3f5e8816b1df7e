"""Attribute TDNet's streaming MFU (BENCH r04: 402 f/s @ 40.9%).

Times the td4_psp streaming step's stages in isolation on the chip, each
as its own scan over frames (same dispatch pattern as the bench row):

  backbone  - one resnet18(dilate_scale=8) forward
  psp       - + channel-sliced PSP
  full      - the shipped stream step (attention over 3 carried K/V
              sources + spatial LayerNorm + FCN head)

and reports each stage's XLA flop count and implied MFU.  Hypothesis:
the 64-channel stem/layer1 convs occupy half of the 128-lane MXU, so
the backbone alone runs well below the R101 trunk's ~71% and the
attention/LN/head stages are bandwidth-bound f32 — i.e. 40% is the
formulation's ceiling, not a dispatch or layout bug.

Prints one JSON line.
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

    from cvpr2021_vspw_implement_tpu.models.td4_psp import (
        TD4PSP, init_td4_state)

    h, w = 480, 853
    N = 64
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    peak = 197e12

    tmodel = TD4PSP(num_class=124, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        tvars = tmodel.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)},
                            jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                            train=True)
    tvars = jax.device_put({"params": tvars["params"],
                            "batch_stats": tvars.get("batch_stats", {})},
                           dev)
    frames = jnp.asarray(
        rng.standard_normal((N, 1, h, w, 3)).astype(np.float32))

    def os8(x):
        for _ in range(3):
            x = (x - 1) // 2 + 1
        return x

    fh, fw = os8(h), os8(w)
    tokens = (-(-fh // 3)) * (-(-fw // 3))

    def stage_fn(stage):
        # path 0 is representative: all four paths are architecture-equal
        def backbone_one(carry, img):
            feats = tmodel.apply(tvars, img,
                                 method=lambda m, x: m.paths[0](x)[-1])
            return carry, jnp.sum(
                feats[:, ::17, ::17].astype(jnp.float32))

        def psp_one(carry, img):
            def run(m, x):
                return m.psps[0](m.paths[0](x)[-1])
            out = tmodel.apply(tvars, img, method=run)
            return carry, jnp.sum(out[:, ::17, ::17].astype(jnp.float32))

        if stage == "backbone":
            one = backbone_one
        elif stage == "psp":
            one = psp_one
        else:
            def one(st, img):
                out, st = tmodel.apply(tvars, img, pos_id=0, state=st)
                return st, jnp.sum(out[:, ::31, ::31].astype(jnp.float32))

        @jax.jit
        def run(fr):
            init = init_td4_state(batch=1, tokens=tokens) \
                if stage == "full" else 0
            _, sums = jax.lax.scan(one, init, fr)
            return jnp.sum(sums)
        return run, one

    out = {"metric": "tdnet_stage_attribution", "unit": "ms/frame",
           "shape": f"{h}x{w}", "peak_tflops": 197.0}
    for stage in ("backbone", "psp", "full"):
        fn, one = stage_fn(stage)
        float(fn(frames))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(frames))
            best = min(best, time.perf_counter() - t0)
        ms = best / N * 1e3
        # flops of ONE scan body at this stage
        if stage == "full":
            st0 = init_td4_state(batch=1, tokens=tokens)
            lowered = jax.jit(one).lower(st0, frames[0])
        else:
            lowered = jax.jit(one).lower(0, frames[0])
        try:
            fl = lowered.compile().cost_analysis()["flops"]
        except Exception:
            fl = None
        mfu = fl / (best / N) / 197e12 if fl else None
        out[stage + "_ms"] = round(ms, 3)
        out[stage + "_gflops"] = round(fl / 1e9, 2) if fl else None
        out[stage + "_mfu"] = round(mfu, 4) if mfu else None
        print(f"{stage}: {ms:.2f} ms/frame, "
              f"{(fl or 0)/1e9:.1f} GF, MFU {mfu or 0:.3f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
