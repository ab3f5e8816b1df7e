"""Does batching encode_frame over TIME lift single-stream serving?

serve_micro.py attributed the 6.20 ms streaming step: trunk 4.54 ms at
67% MFU — 77% of its own bandwidth roofline, with the gap ascribed to
B=1 occupancy.  But the streamer's per-frame dependency chain is ONLY
the pooled-stat blend (61 us); ``encode_frame`` itself is frame-
independent, so a single video's frames can be encoded in batches of K
(trunk at B=K) while fusion stays per-frame.  The 4-stream row already
proved batching across VIDEOS recovers utilization (BENCH_r04); this
micro measures the same effect across TIME within one video — the
shape every VSPW eval actually runs.

Times the full encode_frame (trunk + 4-scale pooled pyramid) at
B = 1/2/4/8, 480x853 bf16, inside a lax.scan over 64/B batches, and
reports per-frame ms + the projected full-step frame rate assuming the
measured per-frame fuse+pred cost (1.38 + 0.22 ms from serve_micro)
stays B=1.

Run on the real TPU: `timeout 3600 python tools/batch_encode_micro.py`.
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

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    enc = ModelBuilder.build_encoder("resnet101dilated", dtype=jnp.bfloat16)
    model = ClipPSP(encoder=enc, num_class=124, fc_dim=2048,
                    dtype=jnp.bfloat16)
    h, w = 480, 853
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                               train=False)
    variables = jax.device_put(variables, dev)

    N = 64
    fuse_pred_ms = 1.38 + 0.217   # serve_micro per-frame fuse + pred
    out = {"metric": "batch_encode_micro",
           "shape": "480x853 bf16 encode_frame, 64 frames total",
           "fuse_pred_ms_assumed": fuse_pred_ms}

    for B in (1, 2, 4, 8):
        frames = jnp.asarray(
            rng.standard_normal((N // B, B, h, w, 3)).astype(np.float32))

        @jax.jit
        def run(frames):
            def step(c, img):
                c5, pooled = model.apply(variables, img, train=False,
                                         method=model.encode_frame)
                s = (jnp.sum(c5[:, ::13, ::13].astype(jnp.float32))
                     + sum(jnp.sum(p.astype(jnp.float32)) for p in pooled))
                return c, s
            _, sums = jax.lax.scan(step, 0.0, frames)
            return jnp.sum(sums)

        s = run(frames)
        float(s)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            s = run(frames)
            float(s)
            best = min(best, (time.perf_counter() - t0) / N)
        proj_fps = 1000.0 / (best * 1e3 + fuse_pred_ms)
        out[f"encode_b{B}_ms_per_frame"] = round(best * 1e3, 3)
        out[f"projected_full_step_fps_b{B}"] = round(proj_fps, 1)
        print(f"B={B}: encode {best*1e3:.3f} ms/frame, projected full-step "
              f"{proj_fps:.1f} f/s", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
