"""MobileNetV2 backbone with output-stride-8/16 dilation surgery.

Re-implements the reference encoder (reference: models/mobilenet.py:38-154
and the ``MobileNetV2Dilated`` wrapper at models/models.py:770-822) in
flax/NHWC.  The wrapper drops the final 1x1-1280 conv (``features[:-1]``),
taps features after blocks {2, 4, 7, 14} plus the last block, and applies
the same no-stride-dilate surgery as ResnetDilated to blocks [7,14) (d=2)
and [14,18) (d=4) for dilate_scale=8.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm2d, Conv, kaiming_normal_fan_out

# (expand_ratio, out_channels, num_blocks, stride) per group
# (reference: models/mobilenet.py:86-94)
_IR_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
_DOWN_IDX = (2, 4, 7, 14)


class InvertedResidual(nn.Module):
    in_ch: int
    out_ch: int
    stride: int
    expand_ratio: int
    dilation: int = 1       # dilation of the depthwise conv
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = round(self.in_ch * self.expand_ratio)
        use_res = self.stride == 1 and self.in_ch == self.out_ch
        out = x
        idx = 0
        if self.expand_ratio != 1:
            out = Conv(hidden, 1, use_bias=False, dtype=self.dtype,
                       kernel_init=kaiming_normal_fan_out, name=f"conv_{idx}")(out)
            out = BatchNorm2d(hidden, dtype=self.dtype, name=f"bn_{idx}")(out, train)
            out = jnp.minimum(nn.relu(out), 6.0)
            idx += 1
        out = Conv(hidden, 3, self.stride, padding=self.dilation,
                   dilation=self.dilation, groups=hidden, use_bias=False,
                   dtype=self.dtype, kernel_init=kaiming_normal_fan_out,
                   name=f"conv_{idx}")(out)
        out = BatchNorm2d(hidden, dtype=self.dtype, name=f"bn_{idx}")(out, train)
        out = jnp.minimum(nn.relu(out), 6.0)
        idx += 1
        out = Conv(self.out_ch, 1, use_bias=False, dtype=self.dtype,
                   kernel_init=kaiming_normal_fan_out, name=f"conv_{idx}")(out)
        out = BatchNorm2d(self.out_ch, dtype=self.dtype, name=f"bn_{idx}")(out, train)
        return x + out if use_res else out


class MobileNetV2Dilated(nn.Module):
    """MobileNetV2 trunk returning the 5-level feature pyramid."""

    dilate_scale: int | None = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature_maps: bool = True):
        dt = self.dtype
        x = x.astype(dt or x.dtype)
        # stem conv (features[0])
        x = Conv(32, 3, 2, padding=1, use_bias=False, dtype=dt,
                 kernel_init=kaiming_normal_fan_out, name="stem_conv")(x)
        x = BatchNorm2d(32, dtype=dt, name="stem_bn")(x, train)
        x = jnp.minimum(nn.relu(x), 6.0)

        # flatten the IR setting to 17 per-block configs (features[1..17])
        blocks = []
        in_ch = 32
        for t, c, n, s in _IR_SETTING:
            for i in range(n):
                blocks.append((in_ch, c, s if i == 0 else 1, t))
                in_ch = c
        total = len(blocks) + 1  # +1 for the stem == reference total_idx 18

        conv_out = []
        for bi, (ic, oc, stride, t) in enumerate(blocks):
            feat_idx = bi + 1  # index in reference features list
            dilation = 1
            if self.dilate_scale == 8:
                if _DOWN_IDX[2] <= feat_idx < _DOWN_IDX[3]:
                    d = 2
                elif feat_idx >= _DOWN_IDX[3]:
                    d = 4
                else:
                    d = 1
                if d > 1:
                    # strided dw conv: stride→1, dilation d/2; others: dilation d
                    dilation = d // 2 if stride == 2 else d
                    stride = 1
            elif self.dilate_scale == 16 and feat_idx >= _DOWN_IDX[3]:
                dilation = 1 if stride == 2 else 2
                stride = 1
            x = InvertedResidual(ic, oc, stride, t, dilation, dtype=dt,
                                 name=f"block_{feat_idx}")(x, train)
            if feat_idx in _DOWN_IDX:
                conv_out.append(x)
        conv_out.append(x)
        if return_feature_maps:
            return conv_out
        return [x]
