"""Decompose the width-bucketed masked streaming overhead (BENCH r04:
72% on clip_psp, 78% clipocr, 42% tdnet vs the exact-shape kernels).

Times four clip_psp per-frame step variants on the real chip:
  A. exact unmasked step @ 480x853 (the bench headline kernel)
  B. unmasked step @ 512x896 (padding-only compute cost)
  C. masked ENCODE only @ 512x896 (adds the conv-boundary interceptor)
  D. full masked step @ 512x896 (adds masked pools/fuse/pred_rt)
Overhead decomposition: (B-A) = padding, (C-B_encode) = interceptor
wheres, (D-C-fuse) = masked global ops.  Prints one JSON line.
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
    from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_pred, inference_pred_rt)
    from cvpr2021_vspw_implement_tpu.ops.masked import (bucket_hw,
                                                        feature_valid)

    dev = jax.devices()[0]
    h, w = 480, 853
    hp, wp = bucket_hw(h, w)
    N = 32
    rng = np.random.default_rng(0)

    enc = ModelBuilder.build_encoder("resnet101dilated", dtype=jnp.bfloat16)
    model = ClipPSP(encoder=enc, num_class=124, fc_dim=2048,
                    dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                               train=False)
    variables = jax.device_put(variables, dev)

    frames = jnp.asarray(
        rng.standard_normal((N, 1, h, w, 3)).astype(np.float32))
    frames_p = jnp.pad(frames, ((0, 0), (0, 0), (0, hp - h),
                                (0, wp - w), (0, 0)))
    pooled0 = [jnp.zeros((1, s, s, 2048), jnp.bfloat16) for s in (1, 2, 3, 6)]

    def timeit(fn, *a, label=""):
        float(fn(*a))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*a))
            best = min(best, time.perf_counter() - t0)
        ms = best / N * 1e3
        print(f"{label}: {ms:.2f} ms/frame", flush=True)
        return round(ms, 2)

    def step_exact(ph, pw, use_frames):
        @jax.jit
        def run(fr, b0):
            def one(bp, img):
                c5, pooled = model.apply(variables, img, train=False,
                                         method=model.encode_frame)
                blended = [jnp.mean(jnp.stack([p, q]), 0)
                           for p, q in zip(pooled, bp)]
                logits = model.apply(variables, c5, blended, train=False,
                                     method=model.fuse_target)
                pred = inference_pred((logits,), (ph, pw))
                return pooled, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))
            _, s = jax.lax.scan(one, b0, fr)
            return jnp.sum(s)
        return run

    out = {"metric": "masked_overhead_decomposition", "unit": "ms/frame"}
    out["A_exact_480x853"] = timeit(step_exact(h, w, frames), frames,
                                    pooled0, label="A exact 480x853")
    out["B_unmasked_512x896"] = timeit(step_exact(hp, wp, frames_p),
                                       frames_p, pooled0,
                                       label="B unmasked 512x896")

    # C: masked encode only (interceptor cost), unmasked fuse skipped
    @jax.jit
    def run_enc_masked(fr, hv, wv):
        def one(_, img):
            c5, pooled = model.apply(variables, img, train=False,
                                     valid_hw=(hv, wv),
                                     method=model.encode_frame)
            return 0, jnp.sum(c5[0, ::31, ::31].astype(jnp.float32))
        _, s = jax.lax.scan(one, 0, fr)
        return jnp.sum(s)

    @jax.jit
    def run_enc_plain(fr):
        def one(_, img):
            c5, pooled = model.apply(variables, img, train=False,
                                     method=model.encode_frame)
            return 0, jnp.sum(c5[0, ::31, ::31].astype(jnp.float32))
        _, s = jax.lax.scan(one, 0, fr)
        return jnp.sum(s)

    hv, wv = jnp.int32(h), jnp.int32(w)
    out["enc_plain_512x896"] = timeit(run_enc_plain, frames_p,
                                      label="encode plain 512x896")
    out["C_enc_masked_512x896"] = timeit(run_enc_masked, frames_p, hv, wv,
                                         label="C encode masked 512x896")

    # D: full masked step (the bench's bucketed row)
    @jax.jit
    def run_bk(fr, b0, hv, wv):
        def one(bp, img):
            c5, pooled = model.apply(variables, img, train=False,
                                     valid_hw=(hv, wv),
                                     method=model.encode_frame)
            blended = [jnp.mean(jnp.stack([p, q]), 0)
                       for p, q in zip(pooled, bp)]
            fv = feature_valid(c5.shape[1], c5.shape[2], (hv, wv),
                               (hp, wp))
            logits = model.apply(variables, c5, blended, train=False,
                                 feat_valid=fv, method=model.fuse_target)
            pred = inference_pred_rt((logits,), (hp, wp), fv, (hv, wv))
            return pooled, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))
        _, s = jax.lax.scan(one, b0, fr)
        return jnp.sum(s)

    out["D_masked_full_512x896"] = timeit(run_bk, frames_p, pooled0, hv, wv,
                                          label="D masked full 512x896")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
