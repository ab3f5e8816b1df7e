"""DeepLabV3+ decoder (ASPP + low-level decoder).

Re-implements the reference (reference: models/deeplab.py:36-168) in
flax/NHWC.  With a ResNet backbone the output stride is 8, so ASPP uses
dilations (1, 12, 24, 36); the image-pool branch and the low-level merge
use align_corners=True upsampling exactly as the reference does
(deeplab.py:70, 124).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..ops.masked import (feature_valid, global_avg_pool_rt, mask_valid,
                          resize_bilinear_rt)
from ..ops.pooling import global_avg_pool
from .decoders import _bn_bias_init
from .layers import BatchNorm2d, Conv


class _ASPPBranch(nn.Module):
    kernel_size: int
    dilation: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = 0 if self.kernel_size == 1 else self.dilation
        x = Conv(256, self.kernel_size, padding=pad, dilation=self.dilation,
                 use_bias=False, dtype=self.dtype, name="conv")(x)
        x = BatchNorm2d(256, dtype=self.dtype, bias_init=_bn_bias_init,
                        name="bn")(x, train)
        return nn.relu(x)


class ASPP(nn.Module):
    dilations: tuple = (1, 12, 24, 36)  # output stride 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None):
        """``valid_hw``: runtime (rows, cols) valid size of ``x`` inside a
        width-bucketed zero-padded grid.  ``x`` arrives masked (trunk
        interceptor), so the dilated 3x3 branches are exact on the valid
        region by the zero-padding-conv argument; the image pool averages
        the valid region only (its 1x1 output broadcasts back, so the
        align_corners=True upsample is a constant fill either way)."""
        h, w = x.shape[1:3]
        branches = [
            _ASPPBranch(1, self.dilations[0], self.dtype, name="aspp1")(x, train),
            _ASPPBranch(3, self.dilations[1], self.dtype, name="aspp2")(x, train),
            _ASPPBranch(3, self.dilations[2], self.dtype, name="aspp3")(x, train),
            _ASPPBranch(3, self.dilations[3], self.dtype, name="aspp4")(x, train),
        ]
        g = global_avg_pool(x) if valid_hw is None \
            else global_avg_pool_rt(x, valid_hw)
        g = Conv(256, 1, use_bias=False, dtype=self.dtype, name="gp_conv")(g)
        g = BatchNorm2d(256, dtype=self.dtype, bias_init=_bn_bias_init,
                        name="gp_bn")(g, train)
        g = nn.relu(g)
        branches.append(resize_bilinear(g, (h, w), align_corners=True))

        x = jnp.concatenate(branches, axis=-1)
        x = Conv(256, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm2d(256, dtype=self.dtype, bias_init=_bn_bias_init,
                        name="bn1")(x, train)
        x = nn.relu(x)
        return nn.Dropout(0.5, deterministic=not train, name="drop")(x)


class DeepLab(nn.Module):
    """ASPP + decoder over [C2..C5] (reference: models/deeplab.py:140-168)."""

    num_class: int
    fc_dim: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None,
                 pad_hw=None):
        """``valid_hw``/``pad_hw``: INPUT-resolution runtime valid size and
        static padded size for width-bucketed masked eval (ops/masked.py).
        The decoder spans two strides (ASPP at OS8, low-level at OS4), so
        it derives each level's valid size from the input-level pair; the
        OS8→OS4 merge resize and the 3x3 fusion convs run runtime-masked.
        Valid-region logits equal the unpadded run's."""
        c5, c2 = conv_out[-1], conv_out[-4]
        masked = valid_hw is not None
        fv8 = fv4 = None
        if masked:
            fv8 = feature_valid(c5.shape[1], c5.shape[2], valid_hw, pad_hw)
            fv4 = feature_valid(c2.shape[1], c2.shape[2], valid_hw, pad_hw)
        x = ASPP(dtype=self.dtype, name="aspp")(c5, train, valid_hw=fv8)

        low = Conv(48, 1, use_bias=False, dtype=self.dtype, name="low_conv")(
            c2)
        low = BatchNorm2d(48, dtype=self.dtype, bias_init=_bn_bias_init,
                          name="low_bn")(low, train)
        low = nn.relu(low)

        if masked:
            # BN shifted the padded zeros; re-zero before the 3x3 fusion
            low = mask_valid(low, fv4)
            x = resize_bilinear_rt(mask_valid(x, fv8), low.shape[1:3],
                                   fv8, fv4, align_corners=True)
        else:
            x = resize_bilinear(x, low.shape[1:3], align_corners=True)
        x = jnp.concatenate([x, low], axis=-1)
        for i in range(2):
            x = Conv(256, 3, padding=1, use_bias=False, dtype=self.dtype,
                     name=f"last_conv_{i}")(x)
            x = BatchNorm2d(256, dtype=self.dtype, bias_init=_bn_bias_init,
                            name=f"last_bn_{i}")(x, train)
            x = nn.relu(x)
            if masked:
                x = mask_valid(x, fv4)
            if i == 0:
                x = nn.Dropout(0.5, deterministic=not train,
                               name="last_drop")(x)
        x = nn.Dropout(0.1, deterministic=not train, name="final_drop")(x)
        x = Conv(self.num_class, 1, dtype=self.dtype, name="classifier")(x)
        return (x,)
