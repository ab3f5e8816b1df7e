"""Width-bucketed eval: masked ops with RUNTIME valid sizes.

VSPW-480p eval images are 480 x variable-width across videos
(reference: dataset2.py:34-141 resizes to short-side 480 and keeps the
aspect ratio), so a naive jit-per-shape eval pays one XLA compile per
distinct width.  Bucketing pads every frame to a small static set of
widths and treats the TRUE size as a runtime scalar — one compile per
bucket, predictions bit-identical to the unpadded run on the valid
region.

Exactness argument (tests/test_masked_eval.py proves it end to end):
  * convs: if the padded cols/rows of the INPUT are zero, a zero-padding
    conv's output on the valid region equals the unpadded run's output
    (the taps that reach padded cols read zeros — exactly what SAME
    padding would have supplied at the true boundary).  Only SPATIAL
    (kernel > 1x1) ops can carry padded-region garbage into the valid
    region; BatchNorm's affine, relu, residual adds and 1x1 convs are
    pointwise, so their padded-region garbage is harmless until the next
    spatial conv re-zeros its input.  ``mask_interceptor`` re-zeros
    exactly there (spatial-conv INPUTS) via flax's method interception —
    measured 4x cheaper than masking every Conv/BN boundary because in a
    bottleneck trunk only the narrow ``planes`` tensor needs the extra
    HBM pass (tools/interceptor_micro.py).  Consequences: bare spatial
    functions re-zero their own input via ``current_mask`` (use
    :func:`masked_trunk`), and trunk OUTPUTS are unmasked — call sites
    ``mask_valid`` the levels they feed to non-``*_rt`` consumers.
  * valid sizes at any feature map follow the ratio rule
    ceil(valid_in * size_feat / size_pad) — exact for the stride
    pyramid as long as the bucket is a multiple of the total stride
    (32 covers every encoder here).
  * global ops (adaptive pooling, bilinear resize) cannot be fixed by
    masking alone: their torch bin/sample positions depend on the TRUE
    size.  Because this framework already computes them as dense
    matrices on the MXU (ops/pooling.py, ops/interpolate.py), the masked
    variants below build the SAME matrices at static padded shapes from
    runtime-valid sizes — integer bin math is exact; interpolation
    source positions use exact integer floor-division so tap indices
    match the f64 host computation bit for bit.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp


def ceil_div(a, b):
    return -((-a) // b)


def feature_valid(hf: int, wf: int, valid_hw, pad_hw):
    """Valid (rows, cols) of an [*, hf, wf, C] feature map derived from the
    input-resolution valid/padded sizes (ratio rule)."""
    hv, wv = valid_hw
    hp, wp = pad_hw
    return ceil_div(hv * hf, hp), ceil_div(wv * wf, wp)


def mask_valid(x: jnp.ndarray, valid_hw) -> jnp.ndarray:
    """Zero rows/cols at-or-beyond the (traced) valid sizes of [N,H,W,C]."""
    hv, wv = valid_hw
    h, w = x.shape[1], x.shape[2]
    mh = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) < hv
    mw = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < wv
    return jnp.where((mh & mw)[None, :, :, None], x, jnp.zeros((), x.dtype))


def _linear_weights_rt(in_pad: int, out_pad: int, in_valid, out_valid,
                       align_corners: bool) -> jnp.ndarray:
    """[out_pad, in_pad] torch-linear-interp matrix for RUNTIME sizes.

    Matches ops/interpolate._linear_weights(in_valid, out_valid) on the
    top-left [out_valid, in_valid] block; zero elsewhere.  Source
    positions use exact integer floor-division, so tap indices are exact;
    only the fractional weight is a (single) f32 rounding."""
    rows = jnp.arange(out_pad, dtype=jnp.int32)[:, None]       # [O, 1]
    cols = jnp.arange(in_pad, dtype=jnp.int32)[None, :]        # [1, I]
    inv = jnp.asarray(in_valid, jnp.int32)
    outv = jnp.asarray(out_valid, jnp.int32)
    if align_corners:
        den = jnp.maximum(outv - 1, 1)
        num = rows * (inv - 1)
    else:
        den = 2 * outv
        num = jnp.maximum((2 * rows + 1) * inv - outv, 0)
    x0 = jnp.minimum(num // den, inv - 1)
    x1 = jnp.minimum(x0 + 1, inv - 1)
    lam = ((num - x0 * den).astype(jnp.float32)
           / den.astype(jnp.float32))
    w = ((cols == x0) * (1.0 - lam) + (cols == x1) * lam)
    return jnp.where(rows < outv, w, 0.0)


def resize_bilinear_rt(x: jnp.ndarray, out_pad_hw, in_valid_hw,
                       out_valid_hw, align_corners: bool = False):
    """Bilinear resize of masked [N,H,W,C] to static ``out_pad_hw`` whose
    valid region equals resize(x_valid, out_valid_hw) exactly; rows/cols
    beyond out_valid are zero."""
    oh, ow = out_pad_hw
    n, h, w, c = x.shape
    dt = x.dtype
    xf = x.astype(jnp.float32)
    wh = _linear_weights_rt(h, oh, in_valid_hw[0], out_valid_hw[0],
                            align_corners)
    xf = jnp.einsum("oh,nhwc->nowc", wh, xf)
    ww = _linear_weights_rt(w, ow, in_valid_hw[1], out_valid_hw[1],
                            align_corners)
    xf = jnp.einsum("ow,nhwc->nhoc", ww, xf)
    return xf.astype(dt)


def _adaptive_pool_weights_rt(in_pad: int, out_size: int,
                              in_valid) -> jnp.ndarray:
    """[out_size, in_pad] torch adaptive-avg-pool bin matrix over the
    RUNTIME valid prefix (exact integer bin math)."""
    rows = jnp.arange(out_size, dtype=jnp.int32)[:, None]
    cols = jnp.arange(in_pad, dtype=jnp.int32)[None, :]
    inv = jnp.asarray(in_valid, jnp.int32)
    start = (rows * inv) // out_size
    end = ceil_div((rows + 1) * inv, out_size)
    inside = (cols >= start) & (cols < end)
    return inside / (end - start).astype(jnp.float32)


def adaptive_avg_pool2d_rt(x: jnp.ndarray, output_size,
                           in_valid_hw) -> jnp.ndarray:
    """Adaptive average pool of masked [N,H,W,C] over its valid region to
    a STATIC (out_h, out_w) — equals pooling the unpadded tensor."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    n, h, w, c = x.shape
    dt = x.dtype
    xf = x.astype(jnp.float32)
    wh = _adaptive_pool_weights_rt(h, output_size[0], in_valid_hw[0])
    xf = jnp.einsum("oh,nhwc->nowc", wh, xf)
    ww = _adaptive_pool_weights_rt(w, output_size[1], in_valid_hw[1])
    xf = jnp.einsum("ow,nhwc->nhoc", ww, xf)
    return xf.astype(dt)


def global_avg_pool_rt(x: jnp.ndarray, in_valid_hw,
                       keepdims: bool = True) -> jnp.ndarray:
    hv, wv = in_valid_hw
    s = jnp.sum(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims)
    area = jnp.asarray(hv, jnp.float32) * jnp.asarray(wv, jnp.float32)
    return (s / area).astype(x.dtype)


#: conv module class names matched by the interceptor (by name to avoid
#: an import cycle with models.layers).
_CONV_MODULE_NAMES = frozenset({"Conv", "_Conv", "ConvLocal"})


def _spatial_kernel(module) -> bool:
    """True if the conv module mixes across H/W (any kernel dim > 1).

    1x1 convs are pointwise: garbage in the padded region propagates
    pointwise and never crosses into the valid region, so their inputs
    need no re-zeroing.  Unknown kernel attrs are treated as spatial."""
    k = getattr(module, "kernel_size", None)
    if k is None:
        return True
    if isinstance(k, int):
        return k > 1
    try:
        return any(int(s) > 1 for s in k)
    except TypeError:
        return True


def mask_interceptor(valid_hw, pad_hw):
    """flax ``intercept_methods`` interceptor that re-zeros the padded
    region on the INPUT of every SPATIAL (kernel > 1x1) conv — the
    minimal invariant for bit-exact valid-region outputs.

    Why inputs-of-spatial-convs only (measured on v5e, resnet101dilated
    encode @ 512x896, tools/interceptor_micro.py): any mask op on a big
    activation costs a full HBM pass (~bytes-proportional; XLA does not
    fuse it into the conv) — masking every Conv/BatchNorm boundary cost
    +88% (4.93 -> 9.29 ms/frame) because it re-zeroed every BN output
    including the wide 4*planes bottleneck tensors.  Only spatial convs
    can smear padded-region garbage into the valid region; BatchNorm's
    affine, relu, residual adds and 1x1 convs are all pointwise, so
    their padded-region garbage is harmless until the next spatial conv
    re-masks its input.  In a bottleneck trunk that means masking only
    the narrow ``planes``-channel tensor (1 of 3 BN boundaries, the
    smallest), ~4x fewer bytes.

    Two consequences for callers (use :func:`masked_trunk`, which layers
    the companion ``mask_context``):
      * bare spatial functions (the ResNet stem maxpool) re-zero their
        own input via ``current_mask()``;
      * trunk OUTPUTS are no longer pre-masked — consumers must
        ``mask_valid`` any level they feed to non-masked ops (the
        ``*_rt`` pool/resize matrices read only valid rows/cols and need
        no pre-mask).
    """
    def _mask(x):
        if isinstance(x, jnp.ndarray) and x.ndim == 4:
            hf, wf = x.shape[1], x.shape[2]
            return mask_valid(x, feature_valid(hf, wf, valid_hw, pad_hw))
        return x

    def interceptor(next_fun, args, kwargs, context):
        if (type(context.module).__name__ not in _CONV_MODULE_NAMES
                or context.method_name != "__call__"
                or not _spatial_kernel(context.module)):
            return next_fun(*args, **kwargs)
        if args:
            args = (_mask(args[0]),) + args[1:]
        return next_fun(*args, **kwargs)

    return interceptor


#: trace-time mask context for modules the interceptor cannot cover —
#: ops with GLOBAL spatial statistics (InstanceNorm's per-image mean/var)
#: or raw lax convolutions without a flax module boundary (SepConvGRU's
#: fused gate convs).  Holds (valid_hw, pad_hw) at INPUT resolution; a
#: consumer derives its own feature-level valid size via the ratio rule.
_MASK_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "vspw_mask_ctx", default=None)


@contextlib.contextmanager
def mask_context(valid_hw, pad_hw):
    token = _MASK_CTX.set((valid_hw, tuple(pad_hw)))
    try:
        yield
    finally:
        _MASK_CTX.reset(token)


def current_mask():
    """(valid_hw, pad_hw) of the enclosing ``mask_context``, or None."""
    return _MASK_CTX.get()


@contextlib.contextmanager
def masked_trunk(valid_hw, pad_hw):
    """Run a conv trunk width-bucketed: the spatial-conv-input
    ``mask_interceptor`` plus ``mask_context`` so bare spatial functions
    (stem maxpool, fused GRU convs, InstanceNorm) can re-zero / derive
    runtime-valid sizes themselves."""
    import flax.linen as nn
    with nn.intercept_methods(mask_interceptor(valid_hw, pad_hw)), \
            mask_context(valid_hw, pad_hw):
        yield


def _nearest_weights_rt(in_pad: int, out_pad: int, in_valid,
                        out_valid) -> jnp.ndarray:
    """[out_pad, in_pad] torch-legacy nearest matrix for RUNTIME sizes:
    row i selects col min(floor(i * in_valid / out_valid), in_valid - 1);
    rows >= out_valid are zero (matches ops/interpolate.resize_nearest)."""
    rows = jnp.arange(out_pad, dtype=jnp.int32)[:, None]
    cols = jnp.arange(in_pad, dtype=jnp.int32)[None, :]
    inv = jnp.asarray(in_valid, jnp.int32)
    outv = jnp.asarray(out_valid, jnp.int32)
    src = jnp.minimum((rows * inv) // outv, inv - 1)
    return jnp.where(rows < outv, (cols == src).astype(jnp.float32), 0.0)


def resize_nearest_rt(x: jnp.ndarray, out_pad_hw, in_valid_hw,
                      out_valid_hw) -> jnp.ndarray:
    """Nearest resize of masked [N,H,W,C] to static ``out_pad_hw`` whose
    valid region equals resize_nearest(x_valid, out_valid_hw) exactly;
    rows/cols beyond out_valid are zero."""
    oh, ow = out_pad_hw
    n, h, w, c = x.shape
    dt = x.dtype
    xf = x.astype(jnp.float32)
    wh = _nearest_weights_rt(h, oh, in_valid_hw[0], out_valid_hw[0])
    xf = jnp.einsum("oh,nhwc->nowc", wh, xf)
    ww = _nearest_weights_rt(w, ow, in_valid_hw[1], out_valid_hw[1])
    xf = jnp.einsum("ow,nhwc->nhoc", ww, xf)
    return xf.astype(dt)


def mask_valid_hw2(x: jnp.ndarray, valid_hw) -> jnp.ndarray:
    """Zero the LAST TWO dims of [..., H, W] at-or-beyond the (traced)
    valid sizes — used for correlation-pyramid levels [B, P, Hl, Wl]."""
    hv, wv = valid_hw
    h, w = x.shape[-2], x.shape[-1]
    mh = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) < hv
    mw = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < wv
    return jnp.where(mh & mw, x, jnp.zeros((), x.dtype))


def bucket_size(size: int, multiple: int = 64) -> int:
    """Smallest multiple of ``multiple`` >= size (the compile-count bound
    is the number of distinct bucketed shapes)."""
    return ceil_div(size, multiple) * multiple


def bucket_hw(h: int, w: int, bucket: int = 64, stride: int = 32):
    """Pad sizes for width-bucketed eval.

    Width rounds up to ``bucket`` — the user's compile-count lever across
    the dataset's variable widths.  Height rounds up only to ``stride``
    (the ratio-rule floor: pads must be a multiple of the encoder's total
    stride): VSPW-480p heights are one constant per orientation, so finer
    height granularity costs no extra compiles while 480 stays 480
    instead of padding to 512 — 6.7% of every bucketed kernel's rows were
    pure pad compute (measured: the bucketed serving rows' overhead drops
    ~8 points, BENCH r04).  32-multiple heights also keep NetWarp's
    in-grid symmetric /8 InputPadder emulation feasible:
    (-h) % 8 <= (-h) % 32, so the slack always holds the /8 pad."""
    return bucket_size(h, stride), bucket_size(w, bucket)


def pad_to(img, pad_hw):
    """Zero-pad [H,W,C] or [N,H,W,C] bottom/right to ``pad_hw``."""
    hp, wp = pad_hw
    h, w = (img.shape[0], img.shape[1]) if img.ndim == 3 \
        else (img.shape[1], img.shape[2])
    pads = ((0, hp - h), (0, wp - w), (0, 0))
    if img.ndim == 4:
        pads = ((0, 0),) + pads
    return jnp.pad(jnp.asarray(img), pads)
