"""HRNetV2-W48 backbone (reference: models/hrnet.py:104-446).

Four parallel resolution branches with repeated multi-scale fusion; output
is the concat of all branches upsampled to the highest resolution (720
channels for W48), matching the reference's ``return_feature_maps`` single
feature map (hrnet.py:424-437, fc_dim 720 in config/vsp-hrnetv2.yaml).

Stage layout (hrnet.py:261-264): stage2 = 1 module x 2 branches (48, 96);
stage3 = 4 modules x 3 branches (+192); stage4 = 3 modules x 4 branches
(+384); all BASIC blocks, 4 per branch; stem = two 3x3/2 convs + 4
Bottleneck(64) blocks at stride 4.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..ops.masked import feature_valid, resize_bilinear_rt
from .layers import BatchNorm2d, Conv, kaiming_normal_fan_out
from .resnet import BasicBlock, Bottleneck

_STAGES = {
    2: dict(num_modules=1, channels=(48, 96)),
    3: dict(num_modules=4, channels=(48, 96, 192)),
    4: dict(num_modules=3, channels=(48, 96, 192, 384)),
}
_BLOCKS_PER_BRANCH = 4


class _ConvBN(nn.Module):
    features: int
    stride: int = 1
    kernel: int = 3
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = 1 if self.kernel == 3 else 0
        x = Conv(self.features, self.kernel, self.stride, padding=pad,
                 use_bias=False, dtype=self.dtype,
                 kernel_init=kaiming_normal_fan_out, name="conv")(x)
        x = BatchNorm2d(self.features, dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x) if self.relu else x


class HighResolutionModule(nn.Module):
    """Parallel branches + all-pairs fusion (reference: hrnet.py:104-251)."""

    channels: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False, valid_hw=None, pad_hw=None):
        """``valid_hw``/``pad_hw``: INPUT-resolution runtime valid size and
        static padded size for width-bucketed masked eval (ops/masked.py).
        Convs/BNs are re-zeroed by the caller's mask interceptor; only the
        cross-resolution upsamples need runtime sizes (a static-shape
        bilinear resize computes sampling positions for the PADDED size,
        which differ from the true-size positions near the boundary)."""
        nb = len(self.channels)

        def fv(t):
            return feature_valid(t.shape[1], t.shape[2], valid_hw, pad_hw)

        outs = []
        for i in range(nb):
            x = xs[i]
            for b in range(_BLOCKS_PER_BRANCH):
                x = BasicBlock(self.channels[i],
                               has_downsample=(b == 0 and
                                               x.shape[-1] != self.channels[i]),
                               dtype=self.dtype,
                               name=f"branch{i}_block{b}")(x, train)
            outs.append(x)

        fused = []
        for i in range(nb):
            h, w = outs[i].shape[1:3]
            y = None
            for j in range(nb):
                if j == i:
                    t = outs[j]
                elif j > i:
                    # 1x1 conv + BN then upsample
                    t = _ConvBN(self.channels[i], kernel=1, relu=False,
                                dtype=self.dtype,
                                name=f"fuse{i}_{j}")(outs[j], train)
                    t = resize_bilinear(t, (h, w)) if valid_hw is None \
                        else resize_bilinear_rt(t, (h, w), fv(t),
                                                fv(outs[i]))
                else:
                    # (i-j) stride-2 3x3 convs; ReLU on all but the last
                    t = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        t = _ConvBN(self.channels[i] if last
                                    else self.channels[j],
                                    stride=2, relu=not last, dtype=self.dtype,
                                    name=f"fuse{i}_{j}_{k}")(t, train)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class HRNetStem(nn.Module):
    """Two 3x3/2 convs + 4 Bottleneck(64) blocks (hrnet.py:269-279)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt or x.dtype)
        x = _ConvBN(64, stride=2, dtype=dt, name="stem1")(x, train)
        x = _ConvBN(64, stride=2, dtype=dt, name="stem2")(x, train)
        for b in range(4):
            x = Bottleneck(64, has_downsample=(b == 0), dtype=dt,
                           name=f"layer1_{b}")(x, train)
        return x


class HRNetStages(nn.Module):
    """Transitions + stages 2-4 + multi-resolution concat (hrnet.py:391-437)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None, pad_hw=None):
        dt = self.dtype
        xs = [x]
        for stage in (2, 3, 4):
            cfg = _STAGES[stage]
            chans = cfg["channels"]
            # transition: adapt existing branches, spawn the new one from
            # the previous stage's last branch (hrnet.py:309-343)
            new_xs = []
            for i, c in enumerate(chans):
                if i < len(xs):
                    if xs[i].shape[-1] != c:
                        new_xs.append(_ConvBN(c, dtype=dt,
                                              name=f"transition{stage}_{i}")(
                            xs[i], train))
                    else:
                        new_xs.append(xs[i])
                else:
                    new_xs.append(_ConvBN(c, stride=2, dtype=dt,
                                          name=f"transition{stage}_{i}")(
                        xs[-1], train))
            xs = new_xs
            for m in range(cfg["num_modules"]):
                xs = HighResolutionModule(chans, dtype=dt,
                                          name=f"stage{stage}_m{m}")(
                    xs, train, valid_hw=valid_hw, pad_hw=pad_hw)

        h, w = xs[0].shape[1:3]
        if valid_hw is None:
            ups = [resize_bilinear(b, (h, w)) for b in xs[1:]]
        else:
            fv0 = feature_valid(h, w, valid_hw, pad_hw)
            ups = [resize_bilinear_rt(
                b, (h, w),
                feature_valid(b.shape[1], b.shape[2], valid_hw, pad_hw),
                fv0) for b in xs[1:]]
        return jnp.concatenate([xs[0]] + ups, axis=-1)


class HRNetV2(nn.Module):
    """Full HRNetV2-W48 trunk: returns a single 720-ch feature map list."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature_maps: bool = True,
                 valid_hw=None, pad_hw=None):
        pad_hw = pad_hw or x.shape[1:3]
        x = HRNetStem(dtype=self.dtype, name="stem")(x, train)
        out = HRNetStages(dtype=self.dtype, name="stages")(
            x, train, valid_hw=valid_hw, pad_hw=pad_hw)
        return [out]
