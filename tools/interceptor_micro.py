"""Isolate the mask_interceptor cost on the ResNet-101 encode path.

BENCH r04's bucketed rows showed 42-78% overhead vs the exact-shape
kernels; tools/masked_overhead_micro.py pinned ~90% of it on the encode
interceptor (4.93 -> 9.28 ms/frame @ 512x896).  This micro times encode
under interceptor VARIANTS to find which masks actually cost:

  none     - no interceptor (padding-only baseline)
  inout    - current ops/masked.mask_interceptor (mask input AND output
             of every Conv/BatchNorm)
  out      - mask only module OUTPUTS (fusable into the conv/BN epilogue)
  bn_out   - mask only BatchNorm outputs (minimal invariant for
             conv(bias=False)+BN trunks)

Prints one JSON line with ms/frame per variant.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_variant(valid_hw, pad_hw, which):
    import jax
    import flax.linen as nn
    import jax.numpy as jnp
    from cvpr2021_vspw_implement_tpu.ops.masked import (feature_valid,
                                                        mask_valid)

    def _mask_iota(x):
        hf, wf = x.shape[1], x.shape[2]
        return mask_valid(x, feature_valid(hf, wf, valid_hw, pad_hw))

    def _mask_vec(x):
        # multiply by broadcast 1-D row/col masks instead of a 2-D select
        hf, wf = x.shape[1], x.shape[2]
        hv, wv = feature_valid(hf, wf, valid_hw, pad_hw)
        mh = (jnp.arange(hf, dtype=jnp.int32) < hv).astype(x.dtype)
        mw = (jnp.arange(wf, dtype=jnp.int32) < wv).astype(x.dtype)
        return x * mh[None, :, None, None] * mw[None, None, :, None]

    def _mask_band(x):
        # mask only the last `band` cols + rows (static slices), leave the
        # interior untouched — the interior is always valid for any bucket
        hf, wf = x.shape[1], x.shape[2]
        hv, wv = feature_valid(hf, wf, valid_hw, pad_hw)
        bh = max(1, (64 * hf) // pad_hw[0] + 1)
        bw = max(1, (64 * wf) // pad_hw[1] + 1)
        bh, bw = min(bh, hf), min(bw, wf)
        rows = x[:, hf - bh:, :, :]
        mrow = (jax.lax.broadcasted_iota(jnp.int32, (bh, 1), 0)
                + (hf - bh) < hv).astype(x.dtype)
        rows = rows * mrow[None, :, :, None]
        x = jax.lax.concatenate([x[:, :hf - bh], rows], 1)
        cols = x[:, :, wf - bw:, :]
        mcol = (jax.lax.broadcasted_iota(jnp.int32, (bw,), 0)
                + (wf - bw) < wv).astype(x.dtype)
        cols = cols * mcol[None, None, :, None]
        return jax.lax.concatenate([x[:, :, :wf - bw], cols], 2)

    def _mask_dus(x):
        # same full-pad-region re-zero as _mask_iota, but expressed as a
        # STATIC band slice + where + dynamic_update_slice at a static
        # start: bucket pads are < 64 input px, so the last bh rows / bw
        # cols contain EVERY invalid position; DUS can alias the (dead)
        # operand buffer in place, touching only band bytes instead of
        # rewriting 100% of the tensor to change <15% of it
        hf, wf = x.shape[1], x.shape[2]
        hv, wv = feature_valid(hf, wf, valid_hw, pad_hw)
        bh = min(hf, max(1, (64 * hf) // pad_hw[0] + 1))
        bw = min(wf, max(1, (64 * wf) // pad_hw[1] + 1))
        rows = x[:, hf - bh:, :, :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (bh,), 0) + (hf - bh)
        rows = jnp.where((ridx < hv)[None, :, None, None], rows,
                         jnp.zeros((), x.dtype))
        x = jax.lax.dynamic_update_slice_in_dim(x, rows, hf - bh, axis=1)
        cols = x[:, :, wf - bw:, :]
        cidx = jax.lax.broadcasted_iota(jnp.int32, (bw,), 0) + (wf - bw)
        cols = jnp.where((cidx < wv)[None, None, :, None], cols,
                         jnp.zeros((), x.dtype))
        return jax.lax.dynamic_update_slice_in_dim(x, cols, wf - bw, axis=2)

    def _mask_pallas(x):
        # in-place band re-zero via the aliased pallas kernel; small-C /
        # unaligned tensors fall back to the fused where()
        from cvpr2021_vspw_implement_tpu.ops.pallas.band_zero import (
            band_zero_inplace)
        hf, wf = x.shape[1], x.shape[2]
        hv, wv = feature_valid(hf, wf, valid_hw, pad_hw)
        if x.shape[-1] < 128 or wf % 8:
            return mask_valid(x, (hv, wv))
        return band_zero_inplace(x, hv, wv, pad_hw)

    maskers = {"iota": _mask_iota, "vec": _mask_vec, "band": _mask_band,
               "dus": _mask_dus, "pallas": _mask_pallas}

    def _mask(x):
        if isinstance(x, jnp.ndarray) and x.ndim == 4:
            kind = which.split("_")[-1] if which.split("_")[-1] in maskers \
                else "iota"
            return maskers[kind](x)
        return x

    conv_names = {"Conv", "_Conv", "ConvLocal"}
    bn_names = {"BatchNorm2d", "BatchNorm"}

    from cvpr2021_vspw_implement_tpu.ops.masked import _spatial_kernel

    def interceptor(next_fun, args, kwargs, context):
        name = type(context.module).__name__
        if (name not in conv_names and name not in bn_names) \
                or context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        if which.startswith("spatial"):
            # replicate the PRODUCTION ops/masked.mask_interceptor policy
            # (inputs of kernel>1 convs only) with a selectable masker
            if (name in conv_names and _spatial_kernel(context.module)
                    and args):
                args = (_mask(args[0]),) + args[1:]
            return next_fun(*args, **kwargs)
        mask_in = which == "inout"
        mask_out = which in ("inout", "out") or which.startswith("out_") \
            or (which.startswith("bn") and name in bn_names)
        if mask_in and args:
            args = (_mask(args[0]),) + args[1:]
        out = next_fun(*args, **kwargs)
        return _mask(out) if mask_out else out

    return interceptor


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder

    h, w = 480, 853
    hp, wp = 512, 896
    N = 32
    rng = np.random.default_rng(0)

    enc = ModelBuilder.build_encoder("resnet101dilated", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = enc.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3), jnp.float32))
    variables = jax.device_put(variables, jax.devices()[0])

    frames = jnp.asarray(
        rng.standard_normal((N, 1, hp, wp, 3)).astype(np.float32))
    hv, wv = jnp.int32(h), jnp.int32(w)

    def encode(which):
        @jax.jit
        def run(fr, hv, wv):
            def one(_, img):
                if which == "none":
                    c5 = enc.apply(variables, img)[-1]
                else:
                    with nn.intercept_methods(
                            make_variant((hv, wv), (hp, wp), which)):
                        c5 = enc.apply(variables, img)[-1]
                return 0, jnp.sum(c5[0, ::31, ::31].astype(jnp.float32))
            _, s = jax.lax.scan(one, 0, fr)
            return jnp.sum(s)
        return run

    out = {"metric": "interceptor_variants", "unit": "ms/frame",
           "shape": f"{hp}x{wp}"}
    import sys as _sys
    variants = _sys.argv[1:] or ("none", "bn_iota", "bn_vec", "bn_band",
                                 "out_vec")
    for which in variants:
        fn = encode(which)
        float(fn(frames, hv, wv))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(frames, hv, wv))
            best = min(best, time.perf_counter() - t0)
        ms = round(best / N * 1e3, 2)
        out[which] = ms
        print(f"{which}: {ms} ms/frame", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
