"""RAFT feature/context encoders (reference: RAFT_core/extractor.py).

BasicEncoder: 7x7/2 stem → three 2-block residual stages (64, 96/2, 128/2)
→ 1x1 output conv; norm_fn 'instance' for the feature net and 'batch' for
the context net (reference: RAFT_core/raft.py:39-40).  torch
InstanceNorm2d defaults (affine=False, no running stats) are replicated:
per-sample per-channel normalization over H, W in both train and eval.

The whole flow subsystem is frozen at use (reference: raft.py:43-45), so
BatchNorm here always runs on (imported) running statistics.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import BatchNorm2d, Conv, kaiming_normal_fan_out


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d(affine=False): normalize over H,W per N,C.

    Under an ``ops.masked.mask_context`` (width-bucketed eval) the spatial
    statistics cover only the runtime-valid region — the per-image global
    reduction is the one op in the flow encoders the conv-boundary mask
    interceptor cannot fix, so it reads the context directly."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.masked import current_mask, feature_valid, mask_valid
        xf = x.astype(jnp.float32)
        ctx = current_mask()
        if ctx is not None:
            valid_hw, pad_hw = ctx
            fv = feature_valid(x.shape[1], x.shape[2], valid_hw, pad_hw)
            xm = mask_valid(xf, fv)
            area = jnp.asarray(fv[0] * fv[1], jnp.float32)
            mean = jnp.sum(xm, axis=(1, 2), keepdims=True) / area
            dev = mask_valid(xf - mean, fv)
            var = jnp.sum(dev * dev, axis=(1, 2), keepdims=True) / area
            return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(
                x.dtype)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class _Norm(nn.Module):
    features: int
    norm_fn: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm_fn == "instance":
            return InstanceNorm(name="inorm")(x, train)
        if self.norm_fn == "batch":
            # train=False (running stats) everywhere the flow subsystem is
            # frozen; the chairs-stage RAFT trainer passes train=True so
            # BN statistics update (reference: RAFT/train.py:147-148)
            return BatchNorm2d(self.features, dtype=self.dtype,
                               name="bnorm")(x, train=train)
        if self.norm_fn == "group":
            return nn.GroupNorm(num_groups=self.features // 8,
                                name="gnorm")(x)
        return x  # 'none'


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.planes, 3, self.stride, padding=1, dtype=self.dtype,
                 kernel_init=kaiming_normal_fan_out, name="conv1")(x)
        y = nn.relu(_Norm(self.planes, self.norm_fn, self.dtype,
                          name="norm1")(y, train))
        y = Conv(self.planes, 3, 1, padding=1, dtype=self.dtype,
                 kernel_init=kaiming_normal_fan_out, name="conv2")(y)
        y = nn.relu(_Norm(self.planes, self.norm_fn, self.dtype,
                          name="norm2")(y, train))
        if self.stride != 1:
            x = Conv(self.planes, 1, self.stride, dtype=self.dtype,
                     kernel_init=kaiming_normal_fan_out, name="downsample")(x)
            x = _Norm(self.planes, self.norm_fn, self.dtype,
                      name="norm3")(x, train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(64, 7, 2, padding=3, dtype=self.dtype,
                 kernel_init=kaiming_normal_fan_out, name="conv1")(x)
        x = nn.relu(_Norm(64, self.norm_fn, self.dtype, name="norm1")(x, train))
        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = ResidualBlock(dim, self.norm_fn, stride, self.dtype,
                              name=f"layer{i + 1}_0")(x, train)
            x = ResidualBlock(dim, self.norm_fn, 1, self.dtype,
                              name=f"layer{i + 1}_1")(x, train)
        return Conv(self.output_dim, 1, dtype=self.dtype,
                    kernel_init=kaiming_normal_fan_out, name="conv2")(x)
