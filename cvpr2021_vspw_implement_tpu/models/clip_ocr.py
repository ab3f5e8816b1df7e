"""TCB-OCR — OCR with cross-frame region-context blending.

Re-implements ``ClipOCRNet`` (reference: models/clip_ocr.py:23-198): all clip
frames through the shared encoder, DSN head over all frames, per-frame
spatial gather of region contexts averaged across the clip
(``SpatialTemporalGather_Module``), OCR attention on the target frame (or on
all frames with ``clipocr_all``), plus an optional streaming memory of the
last ``memory_num`` region contexts at inference
(reference: spatial_ocr_block.py:110-129, clip_ocr.py:124-131).

TPU-native formulations:
  * the memory is a fixed-size ring buffer ``(buf [M, B, K, C], count)``
    threaded through the jitted step — a pure scan carry;
  * streaming eval (``encode_frame`` + ``fuse_target``): per-frame region
    contexts are a [K, 512] vector — each video frame is encoded ONCE and
    its context reused by every window containing it, exactly like the
    TCB-PSP streamer (serving.py), with bit-identical predictions.

Note: with ``clipocr_all`` the reference applies OCR attention on all
(T+1)*B frames against a [B]-batched context, which only broadcasts when
B == 1; we tile the blended context across frames (the intended semantics,
identical for B == 1).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..utils.metrics import pixel_acc
from .decoders import _bn_bias_init
from .layers import BatchNorm2d, Conv, Dropout2d
from .ocr import SpatialOCR, spatial_gather
from .segmentation import nll_from_logprobs

MemoryState = tuple  # (buf [M, B, K, C], count int32)


def init_memory(memory_num: int, batch: int, num_class: int,
                channels: int = 512) -> MemoryState:
    return (jnp.zeros((memory_num + 1, batch, num_class, channels),
                      jnp.float32), jnp.zeros((), jnp.int32))


class ClipOCRNet(nn.Module):
    encoder: nn.Module
    num_class: int
    clipocr_all: bool = False
    dtype: Any = None

    def setup(self):
        # biased conv, matching clip_ocr.py:58 (inline Sequential, bias=True)
        self.dsn_conv = Conv(512, 3, padding=1, dtype=self.dtype)
        self.dsn_bn = BatchNorm2d(512, dtype=self.dtype,
                                  bias_init=_bn_bias_init)
        self.dsn_drop = Dropout2d(0.05)
        self.dsn_cls = Conv(self.num_class, 1, dtype=self.dtype)
        self.conv_3x3_conv = Conv(512, 3, padding=1, dtype=self.dtype)
        self.conv_3x3_bn = BatchNorm2d(512, dtype=self.dtype,
                                       bias_init=_bn_bias_init)
        self.spatial_ocr_head = SpatialOCR(512, 256, 512, dropout=0.05,
                                           dtype=self.dtype)
        self.head = Conv(self.num_class, 1, dtype=self.dtype)

    def _dsn(self, c4, train):
        d = nn.relu(self.dsn_bn(self.dsn_conv(c4), train))
        d = self.dsn_drop(d, train)
        return self.dsn_cls(d)

    def _feat(self, c5, train):
        return nn.relu(self.conv_3x3_bn(self.conv_3x3_conv(c5), train))

    def encode_frame(self, img, train: bool = False, valid_hw=None):
        """One frame → (OCR feature map [B,h,w,512], region context [B,K,512]).

        Streaming-eval building block: contexts are a few KB and cached
        across sliding windows.

        ``valid_hw``: runtime (rows, cols) of the TRUE frame inside a
        width-bucketed zero-padded ``img`` — the trunk + heads run under
        the conv-boundary mask interceptor and the gather softmax excludes
        padded pixels (ops/masked.py), so the context equals the unpadded
        run's and the feature map is zero beyond its valid size."""
        if valid_hw is not None:
            from ..ops.masked import (feature_valid, mask_valid,
                                      masked_trunk)
            pad_hw = img.shape[1:3]
            with masked_trunk(valid_hw, pad_hw):
                conv_out = self.encoder(img, train=train)
                x_dsn = self._dsn(conv_out[-2], train)
                feat = self._feat(conv_out[-1], train)
            fv = feature_valid(feat.shape[1], feat.shape[2], valid_hw,
                               pad_hw)
            # re-zero the cached map (spatial-conv-input interceptor
            # leaves module outputs unmasked; the streaming cache contract
            # is zeros beyond the valid extent)
            feat = mask_valid(feat, fv)
            return feat, spatial_gather(feat, x_dsn, valid=fv)
        conv_out = self.encoder(img, train=train)
        x_dsn = self._dsn(conv_out[-2], train)
        feat = self._feat(conv_out[-1], train)
        return feat, spatial_gather(feat, x_dsn)

    def fuse_target(self, target_feat, context, train: bool = False):
        """OCR attention of the target features against the blended region
        context → logits."""
        x = self.spatial_ocr_head(target_feat, context, train)
        return self.head(x)

    def __call__(self, imgs, train: bool = False,
                 memory: MemoryState | None = None, valid_hw=None):
        """imgs: [T+1, B, H, W, 3], target LAST.

        Returns (main, dsn) in training; ((main,), new_memory?) at inference.

        ``valid_hw``: runtime (rows, cols) of the TRUE frames inside
        width-bucketed zero-padded ``imgs`` (eval only) — masked trunk +
        padded-pixel-excluded gather; the OCR chain past the gather is
        per-pixel, so the valid region is exact (covers the ``memory`` and
        ``clipocr_all`` window paths the streamer cannot serve)."""
        t1, b, h, w, _ = imgs.shape
        flat = imgs.reshape(t1 * b, h, w, imgs.shape[-1])
        fv = None
        if valid_hw is not None:
            from ..ops.masked import (feature_valid, mask_valid,
                                      masked_trunk)
            with masked_trunk(valid_hw, (h, w)):
                conv_out = self.encoder(flat, train=train)
                x_dsn = self._dsn(conv_out[-2], train)
                feat = self._feat(conv_out[-1], train)
            fv = feature_valid(feat.shape[1], feat.shape[2], valid_hw,
                               (h, w))
            feat = mask_valid(feat, fv)
        else:
            conv_out = self.encoder(flat, train=train)
            # DSN over all frames (reference: clip_ocr.py:120)
            x_dsn = self._dsn(conv_out[-2], train)
            feat = self._feat(conv_out[-1], train)

        # per-frame region contexts [T+1, B, K, C]
        ctx_frames = spatial_gather(feat, x_dsn, valid=fv).reshape(
            t1, b, self.num_class, 512)

        new_memory = None
        if memory is not None:
            # streaming: push the clip's per-frame contexts into the ring
            # buffer, then blend over the valid entries (reference keeps at
            # most memory_num+1 entries after the final append loop)
            buf, count = memory
            m = buf.shape[0]
            for i in range(t1):
                buf = jnp.roll(buf, -1, axis=0).at[-1].set(
                    ctx_frames[i].astype(jnp.float32))
                count = jnp.minimum(count + 1, m)
            valid = (jnp.arange(m) >= (m - count))[:, None, None, None]
            context = jnp.sum(buf * valid, axis=0) / jnp.maximum(count, 1)
            context = context.astype(feat.dtype)
            new_memory = (buf, count)
        else:
            context = jnp.mean(ctx_frames.astype(jnp.float32),
                               axis=0).astype(feat.dtype)   # [B, K, C]

        if self.clipocr_all:
            ctx_all = jnp.broadcast_to(
                context[None], (t1, b, self.num_class, 512)).reshape(
                t1 * b, self.num_class, 512)
            x = self.fuse_target(feat, ctx_all, train)
            if not train:
                x = x.reshape(t1, b, *x.shape[1:])[-1]
        else:
            target_feat = feat.reshape(t1, b, *feat.shape[1:])[-1]
            x = self.fuse_target(target_feat, context, train)

        if not train:
            return ((x,), new_memory) if memory is not None else (x,)
        return x, x_dsn


def clip_ocr_loss(outs, batch, deep_sup_scale: float | None = 0.4,
                  clipocr_all: bool = False):
    """Training loss (reference: clip_ocr.py:141-198).

    batch["labels"]: [T+1, B, H, W], target last.
    """
    main, dsn = outs
    labels = batch["labels"]
    t1, b, h, w = labels.shape
    all_label = labels.reshape(t1 * b, h, w)
    # reference order: log_softmax at feature res, then bilinear upsample,
    # then NLL (clip_ocr.py:152-161, 182-196)
    dsn_logp = resize_bilinear(
        jax.nn.log_softmax(dsn.astype(jnp.float32), axis=-1), (h, w))
    logp = resize_bilinear(
        jax.nn.log_softmax(main.astype(jnp.float32), axis=-1), (h, w))
    if clipocr_all:
        loss = nll_from_logprobs(logp, all_label)
        acc_ref = jnp.where(all_label == 255, -1, all_label)
    else:
        label = labels[-1]
        loss = nll_from_logprobs(logp, label)
        acc_ref = jnp.where(label == 255, -1, label)
    if deep_sup_scale is not None:
        loss = loss + deep_sup_scale * nll_from_logprobs(dsn_logp, all_label)
    acc = pixel_acc(logp, acc_ref)
    return loss, acc
