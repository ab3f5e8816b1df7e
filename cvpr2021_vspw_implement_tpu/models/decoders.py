"""Segmentation decoders: C1, PPM (PSPNet), UPerNet, and clip variants.

Re-implements the reference decoder zoo (reference: models/models.py:826-1172)
in flax/NHWC.  Contract difference from the reference (documented, math
identical): decoders return *raw logits* (plus deep-supervision logits when
applicable); ``log_softmax`` + NLL is fused into the loss function and
``softmax`` + bilinear upsample into the inference helper
(see segmentation.py), instead of being baked into the decoder forward
(reference applies log_softmax in-decoder at models/models.py:954-957).

The PPM pooling pyramid (adaptive pools at scales 1/2/3/6 + 1x1 conv + BN +
ReLU + bilinear back to feature size) follows models/models.py:889-995; on
TPU both the adaptive pool and the resize are dense matmuls (see ops/).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..ops.masked import (adaptive_avg_pool2d_rt, feature_valid, mask_valid,
                          resize_bilinear_rt)
from ..ops.pooling import adaptive_avg_pool2d
from .layers import BatchNorm2d, Conv, ConvBNReLU, Dropout2d

# decoder BN init follows ModelBuilder.weights_init: weight 1, bias 1e-4
# (reference: models/models.py:514-521)
def _bn_bias_init(key, shape, dtype=jnp.float32):
    return jnp.full(shape, 1e-4, dtype)


class C1(nn.Module):
    """Single conv head (reference: models/models.py:862-886)."""

    num_class: int = 150
    fc_dim: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None):
        c5 = conv_out[-1]
        if valid_hw is not None:
            c5 = mask_valid(c5, valid_hw)
        x = ConvBNReLU(self.fc_dim // 4, dtype=self.dtype,
                       bn_bias_init=_bn_bias_init, name="cbr")(c5, train)
        x = Conv(self.num_class, 1, dtype=self.dtype, name="conv_last_1")(x)
        return (x,)


class C1DeepSup(nn.Module):
    """C1 with deep supervision (reference: models/models.py:826-859)."""

    num_class: int = 150
    fc_dim: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None):
        c5 = conv_out[-1]
        if valid_hw is not None:
            c5 = mask_valid(c5, valid_hw)
        x = ConvBNReLU(self.fc_dim // 4, dtype=self.dtype,
                       bn_bias_init=_bn_bias_init, name="cbr")(c5, train)
        x = Conv(self.num_class, 1, dtype=self.dtype, name="conv_last_")(x)
        if not train:
            return (x,)
        d = ConvBNReLU(self.fc_dim // 4, dtype=self.dtype,
                       bn_bias_init=_bn_bias_init, name="cbr_deepsup")(conv_out[-2], train)
        d = Conv(self.num_class, 1, dtype=self.dtype, name="conv_last_deepsup_")(d)
        return (x, d)


class PPMPyramid(nn.Module):
    """Pooling pyramid producing cat([conv5, branches...]) along channels."""

    fc_dim: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = None

    @nn.compact
    def __call__(self, conv5, train: bool = False, valid_hw=None):
        """``valid_hw``: runtime (rows, cols) valid size of conv5 for
        width-bucketed masked eval (ops/masked.py) — pooling and the
        pyramid resizes then operate on the valid region only, keeping
        the concat exact on it and zero on the padding."""
        h, w = conv5.shape[1:3]
        if valid_hw is not None:
            conv5 = mask_valid(conv5, valid_hw)
        outs = [conv5]
        for i, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool2d(conv5, scale) if valid_hw is None \
                else adaptive_avg_pool2d_rt(conv5, scale, valid_hw)
            p = Conv(512, 1, use_bias=False, dtype=self.dtype,
                     name=f"ppm_{i}_conv")(p)
            p = BatchNorm2d(512, dtype=self.dtype, bias_init=_bn_bias_init,
                            name=f"ppm_{i}_bn")(p, train)
            p = nn.relu(p)
            outs.append(resize_bilinear(p, (h, w)) if valid_hw is None
                        else resize_bilinear_rt(p, (h, w), (scale, scale),
                                                valid_hw))
        return jnp.concatenate(outs, axis=-1)


class PPMLastConv(nn.Module):
    """conv3x3+BN+ReLU(+dropout+classifier) tail of the PPM heads."""

    num_class: int | None  # None → stop at the 512-d embedding (clip variants)
    fc_dim: int
    num_scales: int
    dtype: Any = None

    @nn.compact
    def __call__(self, ppm_out, train: bool = False):
        x = Conv(512, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="0")(ppm_out)
        x = BatchNorm2d(512, dtype=self.dtype, bias_init=_bn_bias_init,
                        name="1")(x, train)
        x = nn.relu(x)
        if self.num_class is None:
            return x
        x = Dropout2d(0.1, name="drop")(x, train)
        return Conv(self.num_class, 1, dtype=self.dtype, name="cls")(x)


class PPM(nn.Module):
    """PSPNet head (reference: models/models.py:889-935)."""

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None):
        ppm_out = PPMPyramid(self.fc_dim, self.pool_scales, self.dtype,
                             name="ppm")(conv_out[-1], train, valid_hw)
        x = PPMLastConv(self.num_class, self.fc_dim, len(self.pool_scales),
                        self.dtype, name="conv_last")(ppm_out, train)
        return (x,)


class PPMDeepsup(nn.Module):
    """PSPNet head + C4 deep supervision (reference: models/models.py:938-995)."""

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None):
        ppm_out = PPMPyramid(self.fc_dim, self.pool_scales, self.dtype,
                             name="ppm")(conv_out[-1], train, valid_hw)
        x = PPMLastConv(self.num_class, self.fc_dim, len(self.pool_scales),
                        self.dtype, name="conv_last_")(ppm_out, train)
        if not train:
            return (x,)
        d = ConvBNReLU(self.fc_dim // 4, dtype=self.dtype,
                       bn_bias_init=_bn_bias_init,
                       name="cbr_deepsup")(conv_out[-2], train)
        d = Dropout2d(0.1, name="dropout_deepsup")(d, train)
        d = Conv(self.num_class, 1, dtype=self.dtype,
                 name="conv_last_deepsup_")(d)
        return (x, d)


class PPMDeepsupClip(nn.Module):
    """PPM head returning (deepsup logits, 512-d embedding, ppm concat) for
    temporal fusion modules (reference: models/models.py:997-1044)."""

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None):
        ppm_out = PPMPyramid(self.fc_dim, self.pool_scales, self.dtype,
                             name="ppm")(conv_out[-1], train, valid_hw)
        emb = PPMLastConv(None, self.fc_dim, len(self.pool_scales),
                          self.dtype, name="conv_last_")(ppm_out, train)
        # the deepsup branch only feeds training losses in every consumer
        # (NetWarp/ETC/ClipWarpNet/PropNet) — skip it at inference, except
        # during init where its params must be created
        if not train and not self.is_initializing():
            return None, emb, ppm_out
        d = ConvBNReLU(self.fc_dim // 4, dtype=self.dtype,
                       bn_bias_init=_bn_bias_init,
                       name="cbr_deepsup")(conv_out[-2], train)
        d = Dropout2d(0.1, name="dropout_deepsup")(d, train)
        d = Conv(self.num_class, 1, dtype=self.dtype,
                 name="conv_last_deepsup_")(d)
        return d, emb, ppm_out


class PPMClip(nn.Module):
    """PPM embedding head without classifier (reference: models/models.py:1046-1083)."""

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None):
        ppm_out = PPMPyramid(self.fc_dim, self.pool_scales, self.dtype,
                             name="ppm")(conv_out[-1], train, valid_hw)
        return PPMLastConv(None, self.fc_dim, len(self.pool_scales),
                           self.dtype, name="conv_last_")(ppm_out, train)


class UPerNet(nn.Module):
    """PPM + FPN decoder (reference: models/models.py:1085-1172)."""

    num_class: int = 150
    fc_dim: int = 4096
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    fpn_inplanes: Sequence[int] = (256, 512, 1024, 2048)
    fpn_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None,
                 pad_hw=None):
        """``valid_hw``/``pad_hw``: INPUT-resolution runtime valid size and
        static padded size for width-bucketed masked eval (ops/masked.py).
        Unlike the OS-8 heads (whose levels share one valid size), the FPN
        levels here sit at different strides, so each level's valid region
        is derived from the input-level pair via the ratio rule.  Masking
        points: every 3x3-conv input (so boundary taps read the zeros SAME
        padding would supply) and every resize (the _rt variants read only
        valid taps and zero the padded output region)."""
        masked = valid_hw is not None
        if masked:
            fv = [feature_valid(c.shape[1], c.shape[2], valid_hw, pad_hw)
                  for c in conv_out]
        conv5 = conv_out[-1]
        h, w = conv5.shape[1:3]
        if masked:
            conv5 = mask_valid(conv5, fv[-1])
        ppm_out = [conv5]
        for i, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool2d(conv5, scale) if not masked \
                else adaptive_avg_pool2d_rt(conv5, scale, fv[-1])
            p = resize_bilinear(p, (h, w)) if not masked \
                else resize_bilinear_rt(p, (h, w), (scale, scale), fv[-1])
            p = Conv(512, 1, use_bias=False, dtype=self.dtype,
                     name=f"ppm_conv_{i}_conv")(p)
            p = BatchNorm2d(512, dtype=self.dtype, bias_init=_bn_bias_init,
                            name=f"ppm_conv_{i}_bn")(p, train)
            p = nn.relu(p)
            ppm_out.append(mask_valid(p, fv[-1]) if masked else p)
        f = ConvBNReLU(self.fpn_dim, dtype=self.dtype,
                       bn_bias_init=_bn_bias_init, name="ppm_last_conv")(
            jnp.concatenate(ppm_out, axis=-1), train)

        fpn_features = [f]
        f_fv = fv[-1] if masked else None
        for i in reversed(range(len(conv_out) - 1)):
            lateral = Conv(self.fpn_dim, 1, use_bias=False, dtype=self.dtype,
                           name=f"fpn_in_{i}_conv")(conv_out[i])
            lateral = BatchNorm2d(self.fpn_dim, dtype=self.dtype,
                                  bias_init=_bn_bias_init,
                                  name=f"fpn_in_{i}_bn")(lateral, train)
            lateral = nn.relu(lateral)
            if masked:
                lateral = mask_valid(lateral, fv[i])
                f = lateral + resize_bilinear_rt(f, lateral.shape[1:3],
                                                 f_fv, fv[i])
                f_fv = fv[i]
            else:
                f = lateral + resize_bilinear(f, lateral.shape[1:3])
            fpn_features.append(
                ConvBNReLU(self.fpn_dim, dtype=self.dtype,
                           bn_bias_init=_bn_bias_init,
                           name=f"fpn_out_{i}")(f, train))
        fpn_features.reverse()  # [P2 ... P5]

        out_hw = fpn_features[0].shape[1:3]
        if masked:
            # fpn_features[j] sits at conv_out[j]'s stride (P5 kept at fv[-1])
            lvl = list(range(len(conv_out) - 1)) + [len(conv_out) - 1]
            fusion = [mask_valid(fpn_features[0], fv[0])] + [
                resize_bilinear_rt(p, out_hw, fv[lvl[j + 1]], fv[0])
                for j, p in enumerate(fpn_features[1:])]
        else:
            fusion = [fpn_features[0]] + [
                resize_bilinear(p, out_hw) for p in fpn_features[1:]]
        x = ConvBNReLU(self.fpn_dim, dtype=self.dtype,
                       bn_bias_init=_bn_bias_init, name="conv_last_0")(
            jnp.concatenate(fusion, axis=-1), train)
        x = Conv(self.num_class, 1, dtype=self.dtype, name="conv_last_1")(x)
        return (x,)
