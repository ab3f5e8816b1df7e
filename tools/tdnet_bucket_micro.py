"""Attribute TDNet's width-bucketed overhead (VERDICT r4 #9).

BENCH r04: tdnet exact 400.9 f/s, bucketed 298.5 (34.3% overhead) — the
worst of the three serving rows (clip_psp 28.6%, clipocr 29.3%).  This
micro decomposes the bucketed stream step at 480x853 → 512x896:

  exact_full     - the shipped exact stream step (baseline)
  pad_backbone   - resnet18 trunk on the PADDED grid, NO masking
                   (pure pixel-inflation cost: 512x896/480x853 = 1.12x)
  masked_backbone- trunk under the spatial-conv-input mask interceptor
  bucket_full    - the shipped masked stream step (trunk + sliced PSP +
                   token-masked attention + masked spatial LN + head)

so the 34% splits into inflation / interceptor / masked-head components,
answering whether td4's floor is higher than clip_psp's because of its
f32 attention+LN masked stages or just the trunk.  Prints one JSON line.

Run on the real TPU: `timeout 4000 python tools/tdnet_bucket_micro.py`.
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

    from cvpr2021_vspw_implement_tpu.models.td4_psp import (TD4PSP,
                                                            init_td4_state)
    from cvpr2021_vspw_implement_tpu.ops.masked import (bucket_hw,
                                                        masked_trunk)

    h, w = 480, 853
    N = 64
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

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
    hp, wp = bucket_hw(h, w)
    frames_p = jnp.pad(frames, ((0, 0), (0, 0), (0, hp - h),
                                (0, wp - w), (0, 0)))

    def os8(x):
        for _ in range(3):
            x = (x - 1) // 2 + 1
        return x

    def tokens_for(hh, ww):
        fh, fw = os8(hh), os8(ww)
        return (-(-fh // 3)) * (-(-fw // 3))

    hv, wv = jnp.int32(h), jnp.int32(w)

    def stage_runner(stage):
        if stage == "exact_full":
            def one(st, img):
                out, st = tmodel.apply(tvars, img, pos_id=0, state=st)
                return st, jnp.sum(out[:, ::31, ::31].astype(jnp.float32))

            @jax.jit
            def run(fr):
                _, s = jax.lax.scan(one, init_td4_state(
                    1, tokens_for(h, w)), fr)
                return jnp.sum(s)
            return run, frames
        if stage == "pad_backbone":
            def one(c, img):
                feats = tmodel.apply(tvars, img,
                                     method=lambda m, x: m.paths[0](x)[-1])
                return c, jnp.sum(feats[:, ::17, ::17].astype(jnp.float32))

            @jax.jit
            def run(fr):
                _, s = jax.lax.scan(one, 0, fr)
                return jnp.sum(s)
            return run, frames_p
        if stage == "masked_backbone":
            def one(c, img):
                def m_run(m, x):
                    with masked_trunk((hv, wv), (hp, wp)):
                        return m.paths[0](x)[-1]
                feats = tmodel.apply(tvars, img, method=m_run)
                return c, jnp.sum(feats[:, ::17, ::17].astype(jnp.float32))

            @jax.jit
            def run(fr):
                _, s = jax.lax.scan(one, 0, fr)
                return jnp.sum(s)
            return run, frames_p
        # bucket_full
        def one(st, img):
            out, st = tmodel.apply(tvars, img, pos_id=0, state=st,
                                   valid_hw=(hv, wv))
            return st, jnp.sum(out[:, ::31, ::31].astype(jnp.float32))

        @jax.jit
        def run(fr):
            _, s = jax.lax.scan(one, init_td4_state(
                1, tokens_for(hp, wp)), fr)
            return jnp.sum(s)
        return run, frames_p

    out = {"metric": "tdnet_bucket_attribution", "unit": "ms/frame",
           "shape": f"{h}x{w} -> {hp}x{wp}"}
    CHAIN = 4  # async dispatches per readback: hides the ~29 ms tunnel
    for stage in ("exact_full", "pad_backbone", "masked_backbone",
                  "bucket_full"):
        run, fr = stage_runner(stage)
        float(run(fr))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                r = run(fr)
            float(r)
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        out[stage + "_ms"] = round(best / N * 1e3, 3)
        print(f"{stage}: {best / N * 1e3:.3f} ms/frame", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
