"""Deep-stem ResNet backbones (ResNet-18/50/101, ResNeXt-101).

Re-implements the reference encoder family (reference: models/resnet.py:95-207,
models/resnext.py:23-154) in flax/NHWC:
  * deep stem: three 3x3 convs (64, 64, 128 channels), stride-2 first conv,
    then 3x3/2 max pool (reference: models/resnet.py:99-110);
  * dilation surgery for output-stride 8/16 replicating
    ``ResnetDilated._nostride_dilate`` (reference: models/models.py:737-750):
    every stride-2 conv in the dilated stages becomes stride 1 (including the
    1x1 downsample), the *formerly strided* 3x3 conv gets dilation d/2 and
    all other 3x3 convs in the stage get dilation d (d = 2 for stage 3,
    4 for stage 4 at OS 8; d = 2 for stage 4 at OS 16);
  * ``__call__`` returns the [C2, C3, C4, C5] pyramid
    (reference: models/models.py:752-768).

TPU notes: blocks can be rematerialised (``jax.checkpoint``) to trade FLOPs
for HBM; convs run in ``dtype`` (bf16 by default) with f32 params/BN stats.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

from flax import linen as nn

from .layers import BatchNorm2d, Conv, kaiming_normal_fan_out


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int | None = None  # dilation of the (formerly) strided conv
    has_downsample: bool = False
    groups: int = 1
    conv_cls: type = Conv     # TapConv under the GPipe engine (layers.py)
    dtype: Any = None

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False, stat_weight=None):
        fd = self.first_dilation or self.dilation
        residual = x
        out = self.conv_cls(self.planes, 3, self.stride, padding=fd, dilation=fd,
                   use_bias=False, dtype=self.dtype,
                   kernel_init=kaiming_normal_fan_out, name="conv1")(x)
        out = BatchNorm2d(self.planes, dtype=self.dtype,
                          name="bn1")(out, train, stat_weight)
        out = nn.relu(out)
        out = self.conv_cls(self.planes, 3, 1, padding=self.dilation,
                   dilation=self.dilation, use_bias=False, dtype=self.dtype,
                   kernel_init=kaiming_normal_fan_out, name="conv2")(out)
        out = BatchNorm2d(self.planes, dtype=self.dtype,
                          name="bn2")(out, train, stat_weight)
        if self.has_downsample:
            residual = self.conv_cls(self.planes, 1, self.stride, use_bias=False,
                            dtype=self.dtype,
                            kernel_init=kaiming_normal_fan_out,
                            name="downsample_conv")(x)
            residual = BatchNorm2d(self.planes, dtype=self.dtype,
                                   name="downsample_bn")(residual, train,
                                                         stat_weight)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int | None = None
    has_downsample: bool = False
    groups: int = 1                    # >1 → ResNeXt GroupBottleneck
    conv_cls: type = Conv     # TapConv under the GPipe engine (layers.py)
    dtype: Any = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False, stat_weight=None):
        fd = self.first_dilation or self.dilation
        out_planes = self.planes * self.expansion
        residual = x
        out = self.conv_cls(self.planes, 1, 1, use_bias=False, dtype=self.dtype,
                   kernel_init=kaiming_normal_fan_out, name="conv1")(x)
        out = BatchNorm2d(self.planes, dtype=self.dtype,
                          name="bn1")(out, train, stat_weight)
        out = nn.relu(out)
        # the 3x3 conv carries stride in torchvision-style ResNet; when the
        # stage is dilated the stride collapses to 1 and fd takes over.
        out = self.conv_cls(self.planes, 3, self.stride, padding=fd, dilation=fd,
                   groups=self.groups, use_bias=False, dtype=self.dtype,
                   kernel_init=kaiming_normal_fan_out, name="conv2")(out)
        out = BatchNorm2d(self.planes, dtype=self.dtype,
                          name="bn2")(out, train, stat_weight)
        out = nn.relu(out)
        out = self.conv_cls(out_planes, 1, 1, use_bias=False, dtype=self.dtype,
                   kernel_init=kaiming_normal_fan_out, name="conv3")(out)
        out = BatchNorm2d(out_planes, dtype=self.dtype,
                          name="bn3")(out, train, stat_weight)
        if self.has_downsample:
            residual = self.conv_cls(out_planes, 1, self.stride, use_bias=False,
                            dtype=self.dtype,
                            kernel_init=kaiming_normal_fan_out,
                            name="downsample_conv")(x)
            residual = BatchNorm2d(out_planes, dtype=self.dtype,
                                   name="downsample_bn")(residual, train,
                                                         stat_weight)
        return nn.relu(out + residual)


class GroupBottleneck(Bottleneck):
    """ResNeXt bottleneck: grouped 3x3, expansion 2
    (reference: models/resnext.py:23-60)."""

    expansion = 2


class ResNetFeatures(nn.Module):
    """Deep-stem ResNet trunk returning the [C2, C3, C4, C5] pyramid."""

    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    dilate_scale: int | None = None    # None (OS 32), 8 or 16
    groups: int = 1
    stage_planes: Sequence[int] = (64, 128, 256, 512)
    remat: bool = False
    # GPipe pipeline over layer3's homogeneous tail blocks (models/pipeline.py):
    # stage params shard over the mesh 'pipe' axis, microbatches flow via
    # collective-permute.  0 = off.
    pipeline_stages: int = 0
    pipeline_micro: int = 1
    # backward schedule of the pipelined tail: "gpipe" (plain autodiff) or
    # "1f1b" (hand-scheduled interleaved backward, O(P) live microbatches —
    # see models/pipeline.py)
    pipeline_schedule: str = "gpipe"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature_maps: bool = True):
        dt = self.dtype
        x = x.astype(dt or x.dtype)
        # deep stem (reference: models/resnet.py:99-106)
        x = Conv(64, 3, 2, padding=1, use_bias=False, dtype=dt,
                 kernel_init=kaiming_normal_fan_out, name="conv1")(x)
        x = nn.relu(BatchNorm2d(64, dtype=dt, name="bn1")(x, train))
        x = Conv(64, 3, 1, padding=1, use_bias=False, dtype=dt,
                 kernel_init=kaiming_normal_fan_out, name="conv2")(x)
        x = nn.relu(BatchNorm2d(64, dtype=dt, name="bn2")(x, train))
        x = Conv(128, 3, 1, padding=1, use_bias=False, dtype=dt,
                 kernel_init=kaiming_normal_fan_out, name="conv3")(x)
        x = nn.relu(BatchNorm2d(128, dtype=dt, name="bn3")(x, train))
        from ..ops.pooling import max_pool_3x3_s2_p1
        x = max_pool_3x3_s2_p1(x)

        # per-stage (stride, dilation, first_dilation) after optional surgery
        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]
        first_dilations = [1, 1, 1, 1]
        if self.dilate_scale == 8:
            strides[2] = strides[3] = 1
            dilations[2], first_dilations[2] = 2, 1
            dilations[3], first_dilations[3] = 4, 2
        elif self.dilate_scale == 16:
            strides[3] = 1
            dilations[3], first_dilations[3] = 2, 1

        block_cls = self.block
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        conv_out = []
        inplanes = 128
        for stage in range(4):
            planes = self.stage_planes[stage]
            pipelined_tail = (self.pipeline_stages > 0 and stage == 2
                              and self.layers[stage] > 1)
            n_blocks = 1 if pipelined_tail else self.layers[stage]
            for b in range(n_blocks):
                first = b == 0
                x = block_cls(
                    planes=planes,
                    stride=strides[stage] if first else 1,
                    dilation=dilations[stage],
                    first_dilation=first_dilations[stage] if first else None,
                    has_downsample=first and (
                        strides[stage] != 1
                        or inplanes != planes * self.block.expansion),
                    groups=self.groups,
                    dtype=dt,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            if pipelined_tail:
                from .pipeline import PipelinedBlocks
                x = PipelinedBlocks(
                    block=block_cls,
                    n_blocks=self.layers[stage] - 1,
                    n_stages=self.pipeline_stages,
                    n_micro=self.pipeline_micro,
                    schedule=self.pipeline_schedule,
                    block_kwargs={"planes": planes, "stride": 1,
                                  "dilation": dilations[stage],
                                  "groups": self.groups, "dtype": dt},
                    name=f"layer{stage + 1}_pipe",
                )(x, train)
            inplanes = planes * self.block.expansion
            conv_out.append(x)
        if return_feature_maps:
            return conv_out
        return [conv_out[-1]]


resnet18 = partial(ResNetFeatures, block=BasicBlock, layers=(2, 2, 2, 2))
resnet50 = partial(ResNetFeatures, block=Bottleneck, layers=(3, 4, 6, 3))
resnet101 = partial(ResNetFeatures, block=Bottleneck, layers=(3, 4, 23, 3))
# reference resnext101: groups=32, expansion-2 blocks on doubled stage widths
resnext101 = partial(ResNetFeatures, block=GroupBottleneck, layers=(3, 4, 23, 3),
                     groups=32, stage_planes=(128, 256, 512, 1024))
