"""Is int8 worth it on the v5e MXU for the R101-OS8 serving trunk?

The v5e datasheet doubles MXU peak at int8 (394 TOPS vs 197 TFLOPs
bf16).  Before building a quantized serving engine, measure the actual
speed of s8xs8->s32 convolutions vs bf16 at the shapes that dominate
the flagship streaming step (R101 dilated OS8 @ 480x853 -> features
60x107):

  l3_3x3   - layer3 bottleneck 3x3, 256ch, dilation 2 (x23 blocks)
  l3_1x1e  - layer3 expand 1x1, 256->1024
  l3_1x1r  - layer3 reduce 1x1, 1024->256
  l4_3x3   - layer4 bottleneck 3x3, 512ch, dilation 4 (x3 blocks)
  l4_1x1e  - layer4 expand 1x1, 512->2048
  stem_7   - would be the 3x3 stem convs at 240x427 (64ch, thin)

For each: bf16 conv, pure int8 conv (pre-quantized operands — the
static-scale PTQ regime), and int8 with DYNAMIC per-tensor activation
quantization fused in (max-abs reduce + scale + cast on the fly — the
calibration-free regime).  Timed INSIDE a 64-iteration ``lax.scan``
over distinct inputs — a single-op program through the axon tunnel
costs ~4 ms wall regardless of size (a first chained-dispatch draft of
this micro measured every conv at ~4 ms), so only in-scan timing
resolves sub-millisecond convs.

Verdict drives whether `--serve_dtype int8` gets built: a quantized
engine only pays if the pure-int8 column shows >=1.4x on the 3x3
bottleneck convs where the serving FLOPs live.

MEASUREMENT CAVEAT (first run, kept for the record): the single-conv-
per-scan-step numbers all landed at 0.45-0.70 ms regardless of FLOPs
(3.4-30 GF) while the full 599-GF trunk runs 4.54 ms — i.e. a ~0.45 ms
per-step floor dominates an isolated conv, so those ratios (1.0-1.16x)
are floor-compressed.  The CHAIN section below is the authoritative
comparison: 32 dependent convs per scan step (requantizing between
layers on the int8 path, exactly as a quantized network would), so
compute dominates the floor, plus an explicit empty-chain floor row.

Run: `timeout 3000 python tools/int8_micro.py`.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def conv(x, k, dilation):
    import jax.lax as lax
    import jax.numpy as jnp
    pad = ((k.shape[0] - 1) // 2 * dilation,) * 2
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=(pad, pad),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.int32 if x.dtype == jnp.int8
                                else jnp.float32))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    H, W = 60, 107
    shapes = {
        "l3_3x3": ((1, H, W, 256), (3, 3, 256, 256), 2),
        "l3_1x1e": ((1, H, W, 256), (1, 1, 256, 1024), 1),
        "l3_1x1r": ((1, H, W, 1024), (1, 1, 1024, 256), 1),
        "l4_3x3": ((1, H, W, 512), (3, 3, 512, 512), 4),
        "l4_1x1e": ((1, H, W, 512), (1, 1, 512, 2048), 1),
        "stem_3x3": ((1, 240, 427, 64), (3, 3, 64, 64), 1),
    }

    out = {"metric": "int8_conv_micro", "device": jax.devices()[0].device_kind}
    N = 64

    def timed(body, xs_stack, k):
        @jax.jit
        def run(xs_stack, k):
            def step(carry, x):
                y = body(x, k)
                return carry, jnp.sum(
                    y[:, ::31, ::31].astype(jnp.float32))
            _, sums = jax.lax.scan(step, 0.0, xs_stack)
            return jnp.sum(sums)

        s = run(xs_stack, k)
        float(s)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            s = run(xs_stack, k)
            float(s)
            best = min(best, (time.perf_counter() - t0) / N)
        return best

    for name, (xs, ks, dil) in shapes.items():
        xstack = jnp.asarray(
            rng.standard_normal((N,) + xs), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal(ks), jnp.bfloat16)
        xqstack = jnp.asarray(rng.integers(-127, 127, (N,) + xs), jnp.int8)
        kq = jnp.asarray(rng.integers(-127, 127, ks), jnp.int8)
        scale = jnp.float32(0.02)

        def f_bf16(x, k, d=dil):
            return conv(x, k, d)

        def f_int8(xq, kq, d=dil):
            return conv(xq, kq, d).astype(jnp.bfloat16) * scale

        def dyn(x, kq, d=dil):
            s = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-6)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / s)),
                          -127, 127).astype(jnp.int8)
            y = conv(xq, kq, d)
            return (y.astype(jnp.float32) * (s / 127.0) * scale
                    ).astype(jnp.bfloat16)

        t_b = timed(f_bf16, xstack, k)
        t_q = timed(f_int8, xqstack, kq)
        t_d = timed(dyn, xstack, kq)
        gf = 2 * xs[0] * xs[1] * xs[2] * ks[0] * ks[1] * ks[2] * ks[3] / 1e9
        out[name] = {"gflops": round(gf, 1),
                     "bf16_ms": round(t_b * 1e3, 3),
                     "int8_ms": round(t_q * 1e3, 3),
                     "int8_dyn_ms": round(t_d * 1e3, 3),
                     "speedup_static": round(t_b / t_q, 2),
                     "speedup_dynamic": round(t_b / t_d, 2)}
        print(f"{name}: bf16 {t_b*1e3:.3f} ms, int8 {t_q*1e3:.3f} "
              f"({t_b/t_q:.2f}x), dyn {t_d*1e3:.3f} ({t_b/t_d:.2f}x)",
              flush=True)

    print(json.dumps(out))

    # ---- chained comparison: compute dominates the per-step floor ----
    CH = 32
    N2 = 8
    chain_out = {"metric": "int8_conv_chain_micro", "chain_len": CH,
                 "scan_steps": N2}

    def timed_chain(step_body, xs, k):
        @jax.jit
        def run(xs, k):
            def step(c, x):
                y = jax.lax.fori_loop(
                    0, CH, lambda i, v: step_body(v, k), x)
                return c, jnp.sum(y[:, ::31, ::31].astype(jnp.float32))
            _, sums = jax.lax.scan(step, 0.0, xs)
            return jnp.sum(sums)

        s = run(xs, k)
        float(s)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            s = run(xs, k)
            float(s)
            best = min(best, (time.perf_counter() - t0) / (N2 * CH))
        return best

    for name in ("l3_3x3", "l4_3x3", "l4_1x1e_sq"):
        if name == "l4_1x1e_sq":
            # square 1x1 so the chain type-checks: 512->512
            xs_shape, ks, dil = (1, H, W, 512), (1, 1, 512, 512), 1
        else:
            xs_shape, ks, dil = shapes[name]
            if ks[2] != ks[3]:
                continue
        xstack = jnp.asarray(
            rng.standard_normal((N2,) + xs_shape), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal(ks) * 0.02, jnp.bfloat16)
        xqstack = jnp.asarray(
            rng.integers(-127, 127, (N2,) + xs_shape), jnp.int8)
        kq = jnp.asarray(rng.integers(-127, 127, ks), jnp.int8)
        fan = ks[0] * ks[1] * ks[2]
        requant = jnp.float32(1.0 / (42.3 * np.sqrt(fan)))

        def bf16_step(v, k, d=dil):
            return conv(v, k, d).astype(jnp.bfloat16)

        def int8_step(v, kq, d=dil):
            y = conv(v, kq, d)  # s32
            return jnp.clip(jnp.round(y.astype(jnp.float32) * requant),
                            -127, 127).astype(jnp.int8)

        t_b = timed_chain(bf16_step, xstack, k)
        t_q = timed_chain(int8_step, xqstack, kq)
        gf = (2 * xs_shape[1] * xs_shape[2] * fan * ks[3]) / 1e9
        chain_out[name] = {
            "gflops": round(gf, 1),
            "bf16_ms": round(t_b * 1e3, 4),
            "int8_ms": round(t_q * 1e3, 4),
            "speedup": round(t_b / t_q, 2),
            "bf16_tflops": round(gf / t_b / 1e3, 1),
            "int8_tops": round(gf / t_q / 1e3, 1)}
        print(f"chain {name}: bf16 {t_b*1e3:.4f} ms/conv "
              f"({gf/t_b/1e3:.0f} TF/s), int8+requant {t_q*1e3:.4f} "
              f"({gf/t_q/1e3:.0f} TOPS, {t_b/t_q:.2f}x)", flush=True)

    # empty-chain floor: same scan/loop scaffolding, no conv
    xstack = jnp.asarray(
        rng.standard_normal((N2, 1, H, W, 256)), jnp.bfloat16)
    k0 = jnp.asarray(rng.standard_normal((3, 3, 256, 256)) * 0.02,
                     jnp.bfloat16)
    floor = timed_chain(lambda v, k: v * jnp.bfloat16(1.0001), xstack, k0)
    chain_out["floor_ms_per_iter"] = round(floor * 1e3, 4)
    print(f"chain floor (no conv): {floor*1e3:.4f} ms/iter", flush=True)
    print(json.dumps(chain_out))


if __name__ == "__main__":
    main()
