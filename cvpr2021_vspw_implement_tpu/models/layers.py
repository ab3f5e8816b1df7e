"""Core flax layers with torch-equivalent numerics.

* ``BatchNorm2d`` — torch ``_BatchNorm`` semantics: normalize with *biased*
  batch variance, update running stats with ``(1-m)*running + m*batch`` using
  the *unbiased* variance (reference: models/sync_batchnorm/batchnorm.py:136-150).

  Cross-replica synchronization is free under GSPMD: when the batch is
  sharded over the mesh 'data' axis, ``jnp.mean`` over the batch compiles to
  a per-device partial reduction + ICI all-reduce — the entire reference
  SyncMaster/SlavePipe thread protocol (models/sync_batchnorm/comm.py:18-137)
  collapses into sharding annotations.  An explicit ``axis_name`` is also
  supported for shard_map/pmap callers.

* ``Conv`` — thin wrapper over ``nn.Conv`` fixing NHWC, torch "kaiming
  normal" init and explicit symmetric padding.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch kaiming_normal_(mode='fan_in', nonlinearity='relu'/'leaky_relu(0)')
kaiming_normal_fan_in = jax.nn.initializers.variance_scaling(
    2.0, "fan_in", "normal")
# the reference ResNet stem init: normal(0, sqrt(2/(k*k*out))) — fan_out
kaiming_normal_fan_out = jax.nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")


class Conv(nn.Module):
    """2D conv, NHWC, torch-style symmetric padding."""

    features: int
    kernel_size: int | Sequence[int] = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype | None = None
    kernel_init: Callable = kaiming_normal_fan_in

    @nn.compact
    def __call__(self, x):
        k = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)


class BatchNorm2d(nn.Module):
    """BatchNorm over NHWC with torch running-stat semantics."""

    features: int
    momentum: float = 0.1          # torch convention: weight of the NEW stat
    eps: float = 1e-5
    dtype: Dtype | None = None
    axis_name: str | None = None   # set when used under shard_map/pmap
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, train: bool = False, stat_weight=None):
        scale = self.param("scale", self.scale_init, (self.features,), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            # mean over N,H,W — under GSPMD with batch sharded on 'data' this
            # IS the cross-replica statistic (XLA inserts the all-reduce).
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
            # single-pass E[x^2]-E[x]^2 keeps sharded BN at one all-reduce,
            # but f32 cancellation can go slightly NEGATIVE when a channel's
            # (bf16-quantized) activations are near-constant with |mean|>>std
            # — then rsqrt(var+eps) is NaN.  Torch's two-pass variance is
            # nonnegative by construction; clamp to match (observed: bf16
            # 479^2 flagship train NaN'd at step 64, tools/bf16_drift.py).
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                # stat_weight (traced scalar in [0,1]) scales the running-stat
                # update: the GPipe engine zeroes it on pipeline-bubble ticks
                # so warmup/drain garbage never leaks into running stats.
                mom = (self.momentum if stat_weight is None
                       else self.momentum * stat_weight)
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1 - mom) * ra_var.value + mom * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return y.astype(self.dtype or x.dtype)


class _ConvParams(nn.Module):
    """Owns kernel/bias under the same names/paths as ``nn.Conv`` so
    TapConv-based modules stay checkpoint-compatible with Conv-based ones."""

    kshape: tuple
    features: int
    use_bias: bool
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, self.kshape,
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tap_conv_s1(xf, kf, kh, kw, d):
    """Stride-1 tap convolution on a PRE-PADDED input: y = sum over taps of
    slice(xf, tap) @ kf[tap].  Custom VJP because XLA's autodiff of the
    slice/accumulate chain lowers pathologically on TPU (measured ~100 ms
    of backward for an 11-block chain whose forward is sub-ms —
    tools/tapconv_micro.py); the hand-written backward is the standard
    conv-gradient-as-conv: dK per tap is an [NHW,Cin]x[NHW,Cout]
    contraction, dX is the TRANSPOSED tap conv of dy (flipped tap offsets,
    kernel transposed) — all plain MXU matmuls, bit-for-bit the same math
    re-associated."""
    H = xf.shape[1] - d * (kh - 1)
    W = xf.shape[2] - d * (kw - 1)
    out = None
    for ky in range(kh):
        for kx in range(kw):
            xs = jax.lax.slice(
                xf, (0, ky * d, kx * d, 0),
                (xf.shape[0], ky * d + H, kx * d + W, xf.shape[3]))
            t = jnp.einsum("nhwi,io->nhwo", xs, kf[ky, kx],
                           preferred_element_type=jnp.float32)
            out = t if out is None else out + t
    return out


def _tap_conv_s1_fwd(xf, kf, kh, kw, d):
    return _tap_conv_s1(xf, kf, kh, kw, d), (xf, kf)


def _tap_conv_s1_bwd(kh, kw, d, res, dy):
    xf, kf = res
    H = xf.shape[1] - d * (kh - 1)
    W = xf.shape[2] - d * (kw - 1)
    dyc = dy.astype(xf.dtype)
    # dK[t] = x_tap[t]^T dy
    dks = []
    for ky in range(kh):
        row = []
        for kx in range(kw):
            xs = jax.lax.slice(
                xf, (0, ky * d, kx * d, 0),
                (xf.shape[0], ky * d + H, kx * d + W, xf.shape[3]))
            row.append(jnp.einsum("nhwi,nhwo->io", xs, dyc,
                                  preferred_element_type=jnp.float32))
        dks.append(jnp.stack(row))
    dkf = jnp.stack(dks).astype(kf.dtype)
    # dX = transposed tap conv: pad dy by d*(k-1), slice with flipped
    # offsets, contract against kf[t]^T
    ph, pw = d * (kh - 1), d * (kw - 1)
    dyp = jnp.pad(dyc, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    dxf = None
    for ky in range(kh):
        for kx in range(kw):
            ds_ = jax.lax.slice(
                dyp, (0, (kh - 1 - ky) * d, (kw - 1 - kx) * d, 0),
                (dyp.shape[0], (kh - 1 - ky) * d + xf.shape[1],
                 (kw - 1 - kx) * d + xf.shape[2], dyp.shape[3]))
            t = jnp.einsum("nhwo,io->nhwi", ds_, kf[ky, kx],
                           preferred_element_type=jnp.float32)
            dxf = t if dxf is None else dxf + t
    return dxf.astype(xf.dtype), dkf


_tap_conv_s1.defvjp(_tap_conv_s1_fwd, _tap_conv_s1_bwd)


class TapConv(nn.Module):
    """Drop-in replacement for ``Conv`` (identical params: <name>/conv/kernel)
    that computes the convolution as a sum of per-tap ``einsum`` contractions
    instead of ``conv_general_dilated``.

    Two reasons to exist:
      * the GPipe engine (models/pipeline.py) vmaps blocks over the stacked
        pipeline-stage axis, and the XLA SPMD partitioner miscompiles
        *vmapped* convolutions on some backends (reproduced on CPU jaxlib:
        a single vmapped 1x1 conv with the kernel sharded on the vmapped
        axis returns wrong values) — batched dot_generals partition
        correctly;
      * per-tap contractions are plain [N*H*W, Cin] x [Cin, Cout] matmuls —
        the exact MXU shape — with the same total FLOPs as the conv.

    The common stride-1/groups-1 case routes through :func:`_tap_conv_s1`,
    whose custom VJP keeps the BACKWARD on the same per-tap-matmul form
    (XLA's autodiff of the slice chain is ~100x slower on TPU).

    Same accumulation count as the conv (taps summed in f32), so numerics
    match Conv to float tolerance.
    """

    features: int
    kernel_size: int | Sequence[int] = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype | None = None
    kernel_init: Callable = kaiming_normal_fan_in

    @nn.compact
    def __call__(self, x):
        kh, kw = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int)\
            else tuple(self.kernel_size)
        cin = x.shape[-1]
        kernel, bias = _ConvParams(
            (kh, kw, cin // self.groups, self.features), self.features,
            self.use_bias, self.kernel_init, name="conv")()
        dt = self.dtype or x.dtype
        xf = x.astype(dt)
        kf = kernel.astype(dt)
        p, d, s = self.padding, self.dilation, self.stride
        if p:
            xf = jnp.pad(xf, ((0, 0), (p, p), (p, p), (0, 0)))
        H = (x.shape[1] + 2 * p - d * (kh - 1) - 1) // s + 1
        W = (x.shape[2] + 2 * p - d * (kw - 1) - 1) // s + 1
        if s == 1 and self.groups == 1:
            out = _tap_conv_s1(xf, kf, kh, kw, d)
            if bias is not None:
                out = out + bias
            return out.astype(dt)
        out = None
        for ky in range(kh):
            for kx in range(kw):
                xs = jax.lax.slice(
                    xf, (0, ky * d, kx * d, 0),
                    (xf.shape[0], ky * d + (H - 1) * s + 1,
                     kx * d + (W - 1) * s + 1, cin),
                    (1, s, s, 1))
                if self.groups == 1:
                    t = jnp.einsum("nhwi,io->nhwo", xs, kf[ky, kx],
                                   preferred_element_type=jnp.float32)
                else:
                    g = self.groups
                    xg = xs.reshape(*xs.shape[:3], g, cin // g)
                    kg = kf[ky, kx].reshape(cin // g, g,
                                            self.features // g)
                    t = jnp.einsum("nhwgi,gio->nhwgo", xg,
                                   kg.transpose(1, 0, 2),
                                   preferred_element_type=jnp.float32)
                    t = t.reshape(*t.shape[:3], self.features)
                out = t if out is None else out + t
        if bias is not None:
            out = out + bias
        return out.astype(dt)


class ConvBNReLU(nn.Module):
    """conv3x3 + BN + ReLU (reference: models/models.py:53-60)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = False  # the OCR heads' inline conv+BN stacks use bias=True
    dtype: Dtype | None = None
    bn_bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, self.kernel_size, self.stride, self.padding,
                 self.dilation, use_bias=self.use_bias, dtype=self.dtype,
                 name="0")(x)
        x = BatchNorm2d(self.features, dtype=self.dtype,
                        bias_init=self.bn_bias_init, name="1")(x, train=train)
        return nn.relu(x)


#: test/debug hook: globally override every Dropout2d rate (e.g. 0.0 for
#: deterministic training-curve comparisons against the torch reference,
#: whose dropout RNG cannot be matched).  Read at TRACE time — set it
#: before building/jitting the step function.
_DROPOUT_OVERRIDE: float | None = None


def set_dropout_override(rate: float | None) -> None:
    global _DROPOUT_OVERRIDE
    _DROPOUT_OVERRIDE = rate


class Dropout2d(nn.Module):
    """Channel dropout over NHWC (torch nn.Dropout2d)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        rate = self.rate if _DROPOUT_OVERRIDE is None else _DROPOUT_OVERRIDE
        return nn.Dropout(rate=rate, broadcast_dims=(1, 2),
                          deterministic=not train)(x)


def log_softmax(x, axis=-1):
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=axis)


def softmax(x, axis=-1):
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis)
