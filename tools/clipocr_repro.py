"""Reproduce the ClipOCR single-stream serving row in isolation.

VERDICT round-3 flagged a 2.55x contradiction: README said 174 f/s @ 71.9%
MFU while the driver's BENCH_r03 recorded 68.2 f/s @ 28.2%.  This script
runs ONLY the ClipOCR streaming row (same construction as bench.py section
5) several times to find which number reproduces and what the spread is.
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
    from cvpr2021_vspw_implement_tpu.models.clip_ocr import ClipOCRNet
    from cvpr2021_vspw_implement_tpu.models.segmentation import inference_pred

    dev = jax.devices()[0]
    peak = 197e12
    h, w = 480, 853
    N = 64
    rng = np.random.default_rng(0)

    oenc = ModelBuilder.build_encoder("resnet101dilated", dtype=jnp.bfloat16)
    omodel = ClipOCRNet(encoder=oenc, num_class=124, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        ovars = omodel.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)},
                            jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                            train=False)
    ovars = jax.device_put(
        {"params": ovars["params"],
         "batch_stats": ovars.get("batch_stats", {})}, dev)

    frames = jnp.asarray(
        rng.standard_normal((N, 1, h, w, 3)).astype(np.float32))

    def ocr_step(ctx_prev, img):
        feat, ctx = omodel.apply(ovars, img, train=False,
                                 method=omodel.encode_frame)
        blended = jnp.mean(jnp.stack([ctx, ctx_prev]), 0)
        logits = omodel.apply(ovars, feat, blended, train=False,
                              method=omodel.fuse_target)
        pred = inference_pred((logits,), (h, w))
        return ctx, jnp.sum(pred[:, ::97, ::97].astype(jnp.int32))

    ctx0 = jnp.zeros((1, 124, 512), jnp.bfloat16)

    @jax.jit
    def run(frames, c0):
        c, sums = jax.lax.scan(ocr_step, c0, frames)
        return jnp.sum(sums)

    t0 = time.perf_counter()
    float(run(frames, ctx0))
    print(f"first exec (incl compile): {time.perf_counter()-t0:.1f}s",
          flush=True)

    fl = None
    try:
        ca = jax.jit(ocr_step).lower(ctx0, frames[0]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca["flops"])
    except Exception:
        pass

    times = []
    for trial in range(8):
        start = time.perf_counter()
        float(run(frames, ctx0))
        dt = time.perf_counter() - start
        times.append(dt)
        fps = N / dt
        mfu = fl * N / dt / peak if fl else None
        print(f"trial {trial}: {dt*1e3:.1f} ms  {fps:.1f} f/s  "
              f"mfu={mfu:.3f}" if mfu else f"trial {trial}: {dt*1e3:.1f} ms",
              flush=True)

    best = min(times)
    print(json.dumps({
        "clipocr_fps_best": round(N / best, 2),
        "clipocr_fps_worst": round(N / max(times), 2),
        "mfu_best": round(fl * N / best / peak, 4) if fl else None,
        "spread_pct": round(100 * (max(times) - best) / best, 1),
    }))


if __name__ == "__main__":
    main()
