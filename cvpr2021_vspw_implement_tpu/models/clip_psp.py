"""TCB-PSP — the paper's Temporal Context Blending over PSP pooling.

Re-implements ``Clip_PSP`` (reference: models/clip_psp.py:63-217): all clip
frames go through the shared encoder; each frame's C5 is adaptive-avg-pooled
at scales (1,2,3,6); the pooled statistics are blended (mean, or
softmax-weighted via ``psp_weight``) across frames; the blended pyramid is
fused into a PPM conv over the *target* frame; deep supervision covers all
frames.

TPU-native formulation: time is a leading axis folded into batch for the
encoder (the reference batch-concats, clip_psp.py:142-144); pooled pyramids
are [T, B, s, s, C] tensors blended with a single ``mean``/weighted-mean on
the time axis.  The pooled statistics per frame are tiny (≤6x6xC), which
enables two things the reference can't do:
  * frame-sharded (sequence-parallel) execution — only the stats cross chips;
  * streaming eval (``encode_frame`` + ``fuse_target``): each video frame is
    encoded exactly ONCE and its pooled stats are reused by every sliding
    window that contains it — ~(T+1)x less encoder work than the reference
    eval loop (test_clip2.py re-encodes the whole window per frame) with
    bit-identical predictions.

Reference quirk preserved: with ``psp_weight`` the pooled features are
ordered [target, others...] while the softmax weights stay in input order
[others..., target] (reference: clip_psp.py:147-187) — the element-wise
product pairs them off-by-one exactly as the original does, and the blend
remains ``mean`` (not sum) after weighting.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..ops.pooling import adaptive_avg_pool2d, global_avg_pool
from ..utils.metrics import pixel_acc
from .decoders import _bn_bias_init
from .layers import BatchNorm2d, Conv, Dropout2d
from .segmentation import nll_from_logprobs


class _ConvBNReLU1x1(nn.Module):
    features: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, 1, use_bias=False, dtype=self.dtype,
                 name="conv")(x)
        x = BatchNorm2d(self.features, dtype=self.dtype,
                        bias_init=_bn_bias_init, name="bn")(x, train)
        return nn.relu(x)


class ClipPSP(nn.Module):
    encoder: nn.Module
    num_class: int
    fc_dim: int = 2048
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    psp_weight: bool = False
    dtype: Any = None

    def setup(self):
        self.ppm_convs = [_ConvBNReLU1x1(512, dtype=self.dtype)
                          for _ in self.pool_scales]
        self.conv_last_conv = Conv(512, 3, padding=1, use_bias=False,
                                   dtype=self.dtype)
        self.conv_last_bn = BatchNorm2d(512, dtype=self.dtype,
                                        bias_init=_bn_bias_init)
        self.conv_last_drop = Dropout2d(0.1)
        self.conv_last_cls = Conv(self.num_class, 1, dtype=self.dtype)
        self.deepsup_conv = Conv(self.fc_dim // 4, 3, padding=1,
                                 use_bias=False, dtype=self.dtype)
        self.deepsup_bn = BatchNorm2d(self.fc_dim // 4, dtype=self.dtype,
                                      bias_init=_bn_bias_init)
        self.deepsup_drop = Dropout2d(0.1)
        self.deepsup_cls = Conv(self.num_class, 1, dtype=self.dtype)
        if self.psp_weight:
            self.pspweight_conv = Conv(1, 1, use_bias=False, dtype=self.dtype)

    def fuse_target(self, target_c5, blended, train: bool = False,
                    feat_valid=None):
        """PPM_conv (reference: clip_psp.py:23-56): per-scale 1x1 conv+BN+ReLU
        on the blended stats, upsample, concat with target C5, fuse.

        target_c5: [B, h, w, C]; blended: list of [B, s, s, C].
        ``feat_valid``: runtime valid (rows, cols) of target_c5 for
        width-bucketed masked eval — the pyramid resizes target the valid
        region and the concat stays zero on the padding, so the fuse conv
        is exact there."""
        fh, fw = target_c5.shape[1:3]
        if feat_valid is not None:
            from ..ops.masked import mask_valid, resize_bilinear_rt
            ppm_out = [mask_valid(target_c5, feat_valid)]
            for conv, feat, s in zip(self.ppm_convs, blended,
                                     self.pool_scales):
                ppm_out.append(resize_bilinear_rt(
                    conv(feat, train), (fh, fw), (s, s), feat_valid))
        else:
            ppm_out = [target_c5]
            for conv, feat in zip(self.ppm_convs, blended):
                ppm_out.append(resize_bilinear(conv(feat, train), (fh, fw)))
        x = jnp.concatenate(ppm_out, axis=-1)
        x = nn.relu(self.conv_last_bn(self.conv_last_conv(x), train))
        x = self.conv_last_drop(x, train)
        return self.conv_last_cls(x)

    def encode_frame(self, img, train: bool = False, valid_hw=None):
        """One frame → (C5 map, per-scale pooled stats [+ psp_weight logit]).
        Streaming-eval building block: the stats are cached and reused
        across windows.

        ``valid_hw``: runtime (rows, cols) of the TRUE frame inside a
        width-bucketed zero-padded ``img`` — the trunk runs under the
        conv-input mask interceptor and pooling covers the valid region
        only (ops/masked.py); the pooled stats equal the unpadded run's."""
        if valid_hw is not None:
            from ..ops.masked import (adaptive_avg_pool2d_rt, feature_valid,
                                      global_avg_pool_rt, mask_valid,
                                      masked_trunk)
            pad_hw = img.shape[1:3]
            with masked_trunk(valid_hw, pad_hw):
                conv_out = self.encoder(img, train=train)
            c5 = conv_out[-1]
            fv = feature_valid(c5.shape[1], c5.shape[2], valid_hw, pad_hw)
            c5 = mask_valid(c5, fv)
            pooled = [adaptive_avg_pool2d_rt(c5, s, fv)
                      for s in self.pool_scales]
            if self.psp_weight:
                wp = global_avg_pool_rt(self.pspweight_conv(c5), fv)
                return c5, (pooled, wp.reshape(-1))
            return c5, pooled
        conv_out = self.encoder(img, train=train)
        c5 = conv_out[-1]
        pooled = [adaptive_avg_pool2d(c5, s) for s in self.pool_scales]
        if self.psp_weight:
            wp = global_avg_pool(self.pspweight_conv(c5))     # [B,1,1,1]
            return c5, (pooled, wp.reshape(-1))
        return c5, pooled

    def __call__(self, imgs, train: bool = False, valid_hw=None):
        """imgs: [T+1, B, H, W, 3] with the target frame LAST.

        Returns (main_logits [B, h, w, C], deepsup_logits [(T+1)*B, h, w, C])
        in training; (main_logits,) at inference.

        ``valid_hw``: runtime (rows, cols) of the TRUE frames inside
        width-bucketed zero-padded ``imgs`` (eval only) — the trunk runs
        under the conv-boundary mask interceptor and every global op
        (pooled stats, psp_weight pooling, pyramid resize) covers the
        valid region only, so the window path (incl. the ``psp_weight``
        variant the streamer cannot serve) is exact on the bucket grid."""
        t1, b, h, w, _ = imgs.shape
        flat = imgs.reshape(t1 * b, h, w, imgs.shape[-1])
        fv = None
        if valid_hw is not None:
            from ..ops.masked import (adaptive_avg_pool2d_rt, feature_valid,
                                      global_avg_pool_rt, mask_valid,
                                      masked_trunk)
            pad_hw = (h, w)
            with masked_trunk(valid_hw, pad_hw):
                conv_out = self.encoder(flat, train=train)
            c5 = conv_out[-1]
            fv = feature_valid(c5.shape[1], c5.shape[2], valid_hw, pad_hw)
            c5 = mask_valid(c5, fv)
        else:
            conv_out = self.encoder(flat, train=train)
            c5 = conv_out[-1]
        fh, fw, fc = c5.shape[1:]
        c5_t = c5.reshape(t1, b, fh, fw, fc)
        target_c5 = c5_t[-1]

        psp_w = None
        if self.psp_weight:
            wp = global_avg_pool_rt(self.pspweight_conv(c5), fv) \
                if fv is not None else \
                global_avg_pool(self.pspweight_conv(c5))     # [(T+1)B,1,1,1]
            # softmax across frames, kept in INPUT order (others..., target)
            psp_w = jax.nn.softmax(
                wp.reshape(t1, b, 1, 1, 1).astype(jnp.float32), axis=0)

        blended = []
        for scale in self.pool_scales:
            p = adaptive_avg_pool2d_rt(c5, scale, fv) if fv is not None \
                else adaptive_avg_pool2d(c5, scale)
            p = p.reshape(t1, b, scale, scale, fc)
            # reference appends target first, then the others
            p = jnp.concatenate([p[-1:], p[:-1]], axis=0)
            if psp_w is not None:
                p = p * psp_w.astype(p.dtype)
            blended.append(jnp.mean(p, axis=0))              # [B, s, s, C]

        main = self.fuse_target(target_c5, blended, train, feat_valid=fv)
        if not train:
            return (main,)

        # deep supervision over ALL frames' C4 (reference: clip_psp.py:205-215)
        d = nn.relu(self.deepsup_bn(self.deepsup_conv(conv_out[-2]), train))
        d = self.deepsup_drop(d, train)
        d = self.deepsup_cls(d)
        return main, d


def clip_psp_loss(outs, batch, deep_sup_scale: float | None = 0.4):
    """Training loss for ClipPSP (reference: clip_psp.py:196-217).

    batch["labels"]: [T+1, B, H, W] int32, target last, 255 = ignore.
    """
    main, deepsup = outs
    labels = batch["labels"]
    t1, b, h, w = labels.shape
    label = labels[-1]
    # reference order (log_softmax at feature res → bilinear upsample →
    # NLL, clip_psp.py:199-215) computed in the projected (transpose-
    # trick) form: identical value/grads, but the [B, H, W, K] and
    # [(T+1)B, H, W, K] full-res log-prob volumes are never materialized
    # for the LOSS (segmentation.py).  The acc metric argmaxes upsampled
    # raw logits under stop_gradient — argmax is invariant to the
    # per-pixel log-softmax shift (resize(lse) is class-independent).
    from .segmentation import upsampled_logprob_loss_projected
    loss = upsampled_logprob_loss_projected(main, label)
    if deep_sup_scale is not None:
        all_label = labels.reshape(t1 * b, h, w)
        loss = loss + deep_sup_scale * upsampled_logprob_loss_projected(
            deepsup, all_label)
    up = resize_bilinear(
        jax.lax.stop_gradient(main).astype(jnp.float32), (h, w))
    acc_label = jnp.where(label == 255, -1, label)
    acc = pixel_acc(up, acc_label)
    return loss, acc
