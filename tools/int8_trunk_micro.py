"""End-to-end verdict for int8 serving: the FULL flagship streaming step
under the ops/quant.py interceptor vs plain bf16.

tools/int8_micro.py's chained section showed the wide spatial convs at
1.44-1.59x (floor-corrected) — this micro answers whether that survives
composition: the interceptor quantizes the l3/l4 bottleneck 3x3s
(min_in_ch=256 spatial convs, ~44% of trunk FLOPs) inside the REAL
encode+blend+fuse+pred step at the bench shape (B=1, 480x853, bf16),
in the bench's own 64-frame lax.scan regime.  Weight quantization is
in-trace (loop-invariant, so XLA may hoist it out of the scan; the
shipped engine would pre-quantize regardless).

Also reports accuracy proxies on random weights/frames: argmax
agreement between bf16 and int8 predictions, and the logits' relative
error — random-weight logits have near-zero margins, so the agreement
printed here is a LOWER bound on trained-weight agreement.

Run on the real TPU: `timeout 3600 python tools/int8_trunk_micro.py`.
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
    from cvpr2021_vspw_implement_tpu.models.segmentation import inference_pred
    from cvpr2021_vspw_implement_tpu.ops.quant import int8_trunk

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
    frames = jnp.asarray(
        rng.standard_normal((N, 1, h, w, 3)).astype(np.float32))
    pooled0 = [jnp.zeros((1, s, s, 2048), jnp.bfloat16) for s in (1, 2, 3, 6)]

    def step(img, blended_prev, quant):
        def fwd():
            c5, pooled = model.apply(variables, img, train=False,
                                     method=model.encode_frame)
            blended = [jnp.mean(jnp.stack([p, q]), 0)
                       for p, q in zip(pooled, blended_prev)]
            logits = model.apply(variables, c5, blended, train=False,
                                 method=model.fuse_target)
            return pooled, logits
        if quant:
            with int8_trunk(min_in_ch=256):
                return fwd()
        return fwd()

    out = {"metric": "int8_trunk_micro",
           "shape": "B=1 480x853 bf16 full streaming step, 64-frame scan"}
    times = {}
    for tag, quant in (("bf16", False), ("int8", True)):
        @jax.jit
        def run(frames, b0, _q=quant):
            def body(carry, img):
                pooled, logits = step(img, carry, _q)
                pred = inference_pred((logits,), (h, w))
                return pooled, jnp.sum(
                    pred[0, ::97, ::97].astype(jnp.int32)).astype(jnp.float32)
            _, sums = jax.lax.scan(body, b0, frames)
            return jnp.sum(sums)

        s = run(frames, pooled0)
        float(s)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            s = run(frames, pooled0)
            float(s)
            best = min(best, (time.perf_counter() - t0) / N)
        times[tag] = best
        out[tag + "_ms_per_frame"] = round(best * 1e3, 3)
        out[tag + "_fps"] = round(1000.0 / (best * 1e3), 1)
        print(f"{tag}: {best*1e3:.3f} ms/frame ({1000/(best*1e3):.1f} f/s)",
              flush=True)
    out["speedup"] = round(times["bf16"] / times["int8"], 3)

    # accuracy proxy on one frame (random weights => worst-case margins)
    @jax.jit
    def compare(img, b0):
        _, la = step(img, b0, False)
        _, lb = step(img, b0, True)
        pa = inference_pred((la,), (h, w))
        pb = inference_pred((lb,), (h, w))
        agree = jnp.mean((pa == pb).astype(jnp.float32))
        rel = (jnp.max(jnp.abs(la.astype(jnp.float32)
                               - lb.astype(jnp.float32)))
               / jnp.max(jnp.abs(la.astype(jnp.float32))))
        return agree, rel

    agree, rel = compare(frames[0], pooled0)
    out["argmax_agreement_random_weights"] = round(float(agree), 4)
    out["logits_rel_err"] = round(float(rel), 4)
    print(f"agreement {float(agree):.4f}, logits rel err {float(rel):.4f}",
          flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
