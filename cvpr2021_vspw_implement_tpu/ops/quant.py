"""Opt-in int8 serving quantization for the wide trunk convs.

Measurement-driven scope (tools/int8_micro.py chain section, v5e):
floor-corrected, s8xs8->s32 convolution beats bf16 only on the WIDE
SPATIAL convs — layer3's 3x3 d2 256ch at 1.44x and layer4's 3x3 d4
512ch at 1.59x — while 1x1s and thin stem convs gain nothing (the
requantize pass costs more than the MAC saving at their arithmetic
intensity).  So this module quantizes exactly that profitable subset:
spatial (kernel > 1) ungrouped convs with >= ``min_in_ch`` input
channels, i.e. the R101-OS8 bottleneck 3x3s where ~44% of the serving
trunk FLOPs live.

Scheme (calibration-free PTQ):
  * weights — symmetric per-OUTPUT-CHANNEL int8, quantized once up
    front from the f32 params (``quantize_conv_params``);
  * activations — symmetric per-tensor DYNAMIC int8 (max-abs computed
    on the fly, no calibration set needed);
  * accumulation in s32 on the MXU, dequantized to the conv's own
    compute dtype with the fused ``sx * sw_c`` scale.

Wiring follows the width-bucketing precedent (ops/masked.py): a flax
method interceptor swaps eligible ``flax.linen.Conv`` calls for the
int8 path, so EVERY model family gets the capability without touching
model code.  This is an accuracy/throughput TRADE — predictions are
not bit-identical to bf16 — hence strictly opt-in (``--serve_dtype
int8``), never a default.  (Reference eval loop this accelerates:
/root/reference/test_clip2.py:28-89.)
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def quantize_per_channel(kernel: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of an [h, w, i, o]
    conv kernel.  Returns (kq int8, scale f32 [o]) with
    kernel ≈ kq * scale."""
    kf = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    kq = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def dynamic_quantize(x: jnp.ndarray):
    """Symmetric per-tensor dynamic int8 quantization.  Returns
    (xq int8, sx f32 scalar) with x ≈ xq * sx."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    sx = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _is_flax_conv(module) -> bool:
    """The INNER flax.linen Conv that owns the kernel param — not this
    package's same-named wrapper (models.layers.Conv), which delegates to
    it; intercepting both would quantize twice."""
    return (type(module).__name__ in ("Conv", "_Conv")
            and type(module).__module__.startswith("flax"))


def _eligible(module, x, min_in_ch: int) -> bool:
    k = getattr(module, "kernel_size", None)
    try:
        spatial = any(int(s) > 1 for s in k)
    except TypeError:
        spatial = False
    return (spatial
            and getattr(module, "feature_group_count", 1) == 1
            and x.ndim == 4
            and x.shape[-1] >= min_in_ch)


def _conv_dimension_numbers(module):
    return ("NHWC", "HWIO", "NHWC")


def int8_conv_interceptor(min_in_ch: int = 256, counter: list | None = None):
    """Flax method interceptor running eligible convs as
    s8 x s8 -> s32 with dynamic activation quantization.

    ``counter`` (optional, tests): appends the module path string of each
    conv actually quantized."""

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (context.method_name != "__call__" or not _is_flax_conv(m)
                or not args or not isinstance(args[0], jnp.ndarray)
                or not _eligible(m, args[0], min_in_ch)):
            return next_fun(*args, **kwargs)
        kernel = None
        try:
            params = m.variables.get("params", {})
            kernel = params.get("kernel")
        except Exception:
            kernel = None
        if kernel is None or kernel.ndim != 4:
            # init pass, or an exotic conv — leave untouched
            return next_fun(*args, **kwargs)

        x = args[0]
        # compose with width-bucketed masked eval: this interceptor is the
        # OUTER context (it wraps the whole eval driver) and flax runs
        # outer interceptors FIRST, so returning without next_fun would
        # skip the inner mask interceptor's spatial-conv-input re-zero
        # (ops/masked.py).  Honor the mask here instead: zero-padded
        # inputs quantize to zero and max|x| ignores zeros, so the
        # masked-exactness argument carries over to the int8 path.
        from .masked import current_mask, feature_valid, mask_valid
        mk = current_mask()
        if mk is not None:
            valid_hw, pad_hw = mk
            x = mask_valid(x, feature_valid(x.shape[1], x.shape[2],
                                            valid_hw, pad_hw))
        kq, sw = quantize_per_channel(kernel)
        xq, sx = dynamic_quantize(x)
        y = jax.lax.conv_general_dilated(
            xq, kq,
            window_strides=tuple(m.strides or (1, 1)),
            padding=m.padding,
            rhs_dilation=tuple(m.kernel_dilation or (1, 1)),
            dimension_numbers=_conv_dimension_numbers(m),
            preferred_element_type=jnp.int32)
        out_dt = args[0].dtype if m.dtype is None else m.dtype
        y = (y.astype(jnp.float32) * (sx * sw)).astype(out_dt)
        if m.use_bias:
            bias = m.variables["params"]["bias"]
            y = y + bias.astype(out_dt)
        if counter is not None:
            counter.append("/".join(str(p) for p in m.path))
        return y

    return interceptor


@contextlib.contextmanager
def int8_trunk(min_in_ch: int = 256, counter: list | None = None):
    """Run a forward pass with the wide spatial convs quantized to int8
    (dynamic activations, per-channel weights).  Opt-in serving mode."""
    import flax.linen as nn
    with nn.intercept_methods(int8_conv_interceptor(min_in_ch, counter)):
        yield
