"""Attribute the flagship streaming-serving MFU (70.8% in BENCH_r04).

Times the TCB-PSP R101 streaming per-frame step's stages at the exact
bench shape (B=1, 480x853, bf16 compute, f32 params, inference mode).
Unlike tools/train_micro.py's 8-call chain, each stage here is timed
INSIDE a 64-iteration ``lax.scan`` over distinct frames — the same
dispatch pattern as the bench row itself — because even async chained
dispatches cost ~2.7 ms each through the axon tunnel (the first draft
of this micro measured the full step at 8.84 ms chained vs the bench's
6.18 ms in-scan, with a negative residual), which would drown the
sub-millisecond stages.  Stage costs are clean differentials between
cumulative scan bodies:

  trunk    - R101-dilated encoder forward to C5 only
  encode   - encode_frame (trunk + 4-scale adaptive pooled stats)
  enc_fuse - encode + blend + fuse_target (PPM 1x1 convs, resizes,
             concat, 3x3 fuse conv, classifier) — no prediction
  full     - the shipped one_frame step (+ inference_pred: f32 matmul
             bilinear upsample 60x107 -> 480x853 + argmax),
             identical to bench.py's scan body

so pools = encode - trunk, fuse = enc_fuse - encode,
pred = full - enc_fuse.  Per-stage XLA flop counts / bytes accessed
come from lowering the single-frame component (a scan body is counted
once by cost_analysis), giving each stage an MFU, arithmetic intensity,
and v5e roofline ceiling min(1, AI/240) with "pct_of_roofline" — the
same verdict format as the train-step attribution.  (Reference eval
loop this serving path replaces: /root/reference/test_clip2.py:28-89.)

Run on the real TPU: `timeout 4000 python tools/serve_micro.py`.
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

    dev = jax.devices()[0]
    peak = 197e12
    hbm_peak = 819e9          # v5e HBM GB/s
    balance = peak / hbm_peak  # ~240 flops/byte
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

    def run_trunk(img):
        c5 = model.apply(variables, img, train=False,
                         method=lambda m, x, train: m.encoder(x, train))[-1]
        return jnp.sum(c5[:, ::13, ::13].astype(jnp.float32))

    def run_encode(img, blended_prev):
        c5, pooled = model.apply(variables, img, train=False,
                                 method=model.encode_frame)
        s = (jnp.sum(c5[:, ::13, ::13].astype(jnp.float32))
             + sum(jnp.sum(p.astype(jnp.float32)) for p in pooled))
        return pooled, s

    def run_enc_fuse(img, blended_prev):
        c5, pooled = model.apply(variables, img, train=False,
                                 method=model.encode_frame)
        blended = [jnp.mean(jnp.stack([p, q]), 0)
                   for p, q in zip(pooled, blended_prev)]
        logits = model.apply(variables, c5, blended, train=False,
                             method=model.fuse_target)
        return pooled, jnp.sum(logits[:, ::13, ::13].astype(jnp.float32))

    def run_full(img, blended_prev):
        c5, pooled = model.apply(variables, img, train=False,
                                 method=model.encode_frame)
        blended = [jnp.mean(jnp.stack([p, q]), 0)
                   for p, q in zip(pooled, blended_prev)]
        logits = model.apply(variables, c5, blended, train=False,
                             method=model.fuse_target)
        p = inference_pred((logits,), (h, w))
        return pooled, jnp.sum(p[0, ::97, ::97].astype(jnp.int32)
                               ).astype(jnp.float32)

    stages = {
        "trunk": lambda carry, img: (carry, run_trunk(img)),
        "encode": lambda carry, img: run_encode(img, carry),
        "enc_fuse": lambda carry, img: run_enc_fuse(img, carry),
        "full": lambda carry, img: run_full(img, carry),
    }

    out = {"metric": "serving_step_attribution",
           "shape": "B=1 480x853 bf16 inference, 64-frame scan",
           "peak_tflops": 197.0, "hbm_gbps": 819.0,
           "balance_flops_per_byte": round(balance, 1)}

    def cost_of(tag):
        """Per-frame flops/bytes from the single-frame component."""
        try:
            if tag == "trunk":
                jfn = jax.jit(run_trunk)
                low = jfn.lower(frames[0])
            else:
                fn = {"encode": run_encode, "enc_fuse": run_enc_fuse,
                      "full": run_full}[tag]
                jfn = jax.jit(fn)
                low = jfn.lower(frames[0], pooled0)
            ca = low.compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return ca.get("flops"), ca.get("bytes accessed")
        except Exception:
            return None, None

    times = {}
    for tag, body in stages.items():
        @jax.jit
        def run_scan(frames, carry0, _body=body):
            carry, sums = jax.lax.scan(_body, carry0, frames)
            return jnp.sum(sums)

        carry0 = 0.0 if tag == "trunk" else pooled0
        s = run_scan(frames, carry0)
        float(s)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            s = run_scan(frames, carry0)
            float(s)
            best = min(best, (time.perf_counter() - t0) / N)
        times[tag] = best
        fl, by = cost_of(tag)
        out[tag + "_ms"] = round(best * 1e3, 3)
        out[tag + "_gflops"] = round(fl / 1e9, 1) if fl else None
        mfu = fl / best / peak if fl else None
        out[tag + "_mfu"] = round(mfu, 4) if mfu else None
        out[tag + "_gbytes"] = round(by / 1e9, 3) if by else None
        ai = fl / by if fl and by else None
        out[tag + "_ai"] = round(ai, 1) if ai else None
        if ai:
            ceiling = min(1.0, ai / balance)
            out[tag + "_roofline_mfu"] = round(ceiling, 4)
            out[tag + "_pct_of_roofline"] = (round(100 * mfu / ceiling, 1)
                                             if mfu else None)
        out[tag + "_eff_gbps"] = round(by / best / 1e9, 1) if by else None
        print(f"{tag}: {best*1e3:.3f} ms/frame, {(fl or 0)/1e9:.0f} GF, "
              f"MFU {(mfu or 0):.3f}, {(by or 0)/1e9:.2f} GB, "
              f"AI {(ai or 0):.0f}", flush=True)

    out["pools_ms"] = round((times["encode"] - times["trunk"]) * 1e3, 3)
    out["fuse_ms"] = round((times["enc_fuse"] - times["encode"]) * 1e3, 3)
    out["pred_ms"] = round((times["full"] - times["enc_fuse"]) * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
