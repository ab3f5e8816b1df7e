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
    def __call__(self, x, train: bool = False):
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
            var = mean_sq - jnp.square(mean)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return y.astype(self.dtype or x.dtype)


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
