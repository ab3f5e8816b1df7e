"""NetWarp: flow-guided feature warping (reference: models/netwarp.py,
models/netwarp_ocr.py).

Pipeline (netwarp.py:150-239): frozen RAFT flow between the target and the
previous frame (denormalized 0-255 inputs, padded to /8), a small FlowCNN
refiner over (flow, img1, img2, img2-img1), shared-encoder features for both
frames, bilinear flow-warp of the previous frame's C5 and decoder features,
learned per-channel blend weights w0/w1, classifier on the blended features.

Reference quirks preserved:
  * the flow is resized to feature resolution with NEAREST and kept in
    full-resolution pixel units (no /8 rescale) — netwarp.py:198, 214;
  * encoder input order is [target, prev] (netwarp.py:196);
  * netwarp_ocr's deep supervision pairs dsn preds in [target, prev] order
    against labels concatenated [prev, target] (netwarp_ocr.py:287-295).

RAFT parameters live under the 'raft' scope and are frozen: gradients are
stopped at the flow and the optimizer zeroes the 'raft' subtree (reference
sets requires_grad=False, RAFT_core/raft.py:43-45).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.datasets import MEAN, STD
from ..ops.interpolate import resize_bilinear, resize_nearest
from ..ops.warp import flowwarp
from ..utils.metrics import pixel_acc
from .decoders import PPMDeepsupClip, _bn_bias_init
from .layers import BatchNorm2d, Conv, ConvBNReLU, Dropout2d
from .ocr import SpatialOCR, spatial_gather
from .raft import RAFT, pad_to_multiple_of_8, unpad
from .segmentation import nll_from_logprobs


def denormalize_255(img: jnp.ndarray) -> jnp.ndarray:
    """Undo ImageNet normalization back to 0-255 (netwarp.py:161-168)."""
    return (img * jnp.asarray(STD) + jnp.asarray(MEAN)) * 255.0


class FlowCNN(nn.Module):
    """Flow refiner (reference: models/netwarp.py:49-63)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, img1, img2, flow, train: bool = False):
        x = jnp.concatenate([flow, img1, img2, img2 - img1], axis=-1)
        x = ConvBNReLU(16, dtype=self.dtype, bn_bias_init=_bn_bias_init,
                       name="conv1")(x, train)
        x = ConvBNReLU(32, dtype=self.dtype, bn_bias_init=_bn_bias_init,
                       name="conv2")(x, train)
        x = ConvBNReLU(2, dtype=self.dtype, bn_bias_init=_bn_bias_init,
                       name="conv3")(x, train)
        x = jnp.concatenate([flow, x], axis=-1)
        return ConvBNReLU(2, dtype=self.dtype, bn_bias_init=_bn_bias_init,
                          name="conv4")(x, train)


class SpatialOCRAsDec(nn.Module):
    """OCR decoder without classifier head: returns (512-d feats, dsn logits)
    (reference: netwarp_ocr.py:65-115)."""

    num_class: int
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, feat_valid=None):
        """``feat_valid``: runtime valid (rows, cols) of the (masked) OS-8
        inputs for width-bucketed eval — the 3x3 heads are exact on the
        valid region given zero-masked inputs, the gather softmax excludes
        padded pixels, and the attention/fuse chain past it is per-pixel;
        the returned feature map is re-masked so downstream flow warps
        read zeros beyond the valid extent (== torch OOB zeros)."""
        d = ConvBNReLU(512, use_bias=True, dtype=self.dtype,
                       bn_bias_init=_bn_bias_init,
                       name="dsn_head_cbr")(conv_out[-2], train)
        d = Dropout2d(0.05, name="dsn_drop")(d, train)
        x_dsn = Conv(self.num_class, 1, dtype=self.dtype, name="dsn_cls")(d)
        x = Conv(512, 3, padding=1, dtype=self.dtype,
                 name="conv_3x3_conv")(conv_out[-1])
        x = BatchNorm2d(512, dtype=self.dtype, bias_init=_bn_bias_init,
                        name="conv_3x3_bn")(x, train)
        x = nn.relu(x)
        context = spatial_gather(x, x_dsn, valid=feat_valid)
        x = SpatialOCR(512, 256, 512, dropout=0.05, dtype=self.dtype,
                       name="spatial_ocr_head")(x, context, train)
        if feat_valid is not None:
            from ..ops.masked import mask_valid
            x = mask_valid(x, feat_valid)
        return x, x_dsn


class NetWarp(nn.Module):
    encoder: nn.Module
    num_class: int
    fc_dim: int = 2048
    ocr: bool = False
    raft_iters: int = 20
    dtype: Any = None

    def setup(self):
        self.raft = RAFT(iters=self.raft_iters, dtype=self.dtype)
        self.flowcnn = FlowCNN(dtype=self.dtype)
        self.w0_0 = self.param("w0_0", nn.initializers.ones, (self.fc_dim,))
        self.w0_1 = self.param("w0_1", nn.initializers.zeros, (self.fc_dim,))
        if self.ocr:
            self.decoder = SpatialOCRAsDec(self.num_class, dtype=self.dtype)
            blend_dim = 512
            self.head = Conv(self.num_class, 1, dtype=self.dtype)
        else:
            self.decoder = PPMDeepsupClip(self.num_class, self.fc_dim,
                                          dtype=self.dtype)
            blend_dim = self.fc_dim + 4 * 512
            self.conv_last_0 = Conv(512, 3, padding=1, use_bias=False,
                                    dtype=self.dtype)
            self.conv_last_1 = BatchNorm2d(512, dtype=self.dtype,
                                           bias_init=_bn_bias_init)
            self.conv_last_drop = Dropout2d(0.1)
            self.conv_last_cls = Conv(self.num_class, 1, dtype=self.dtype)
        self.w1_0 = self.param("w1_0", nn.initializers.ones, (blend_dim,))
        self.w1_1 = self.param("w1_1", nn.initializers.zeros, (blend_dim,))

    def _flow(self, target, prev, train, valid_hw=None):
        if valid_hw is not None:
            return self._flow_masked(target, prev, train, valid_hw)
        c_img_f = denormalize_255(target)
        c_pre_f = denormalize_255(prev)
        pad_t, pads = pad_to_multiple_of_8(c_img_f)
        pad_p, _ = pad_to_multiple_of_8(c_pre_f)
        _, flow = self.raft(pad_t, pad_p, test_mode=True)
        flow = jax.lax.stop_gradient(unpad(flow, pads))
        return self.flowcnn(c_img_f, c_pre_f, flow, train)

    def _flow_masked(self, target, prev, train, valid_hw):
        """Width-bucketed flow: emulate the reference's symmetric /8
        InputPadder INSIDE the static bucket grid.  The true image is
        rolled to the reference's (top, left) pad offset — stride-2 convs
        are not shift-covariant, so exactness requires computing at the
        reference's exact padded geometry — RAFT runs masked to the
        /8-aligned (H8, W8) extent, and the flow is rolled back before the
        FlowCNN refiner (reference: netwarp.py:169-195)."""
        from ..ops.masked import mask_valid, masked_trunk
        hv, wv = valid_hw
        hv = jnp.asarray(hv, jnp.int32)
        wv = jnp.asarray(wv, jnp.int32)
        pad_hw = target.shape[1:3]
        c_img_f = mask_valid(denormalize_255(target), (hv, wv))
        c_pre_f = mask_valid(denormalize_255(prev), (hv, wv))
        # reference pad arithmetic (RAFT_core/utils/utils.py:11-14)
        pad_h = (((hv // 8) + 1) * 8 - hv) % 8
        pad_w = (((wv // 8) + 1) * 8 - wv) % 8
        top, left = pad_h // 2, pad_w // 2
        h8, w8 = hv + pad_h, wv + pad_w
        roll = lambda x, sh, sw: jnp.roll(x, (sh, sw), axis=(1, 2))
        _, flow = self.raft(roll(c_img_f, top, left),
                            roll(c_pre_f, top, left),
                            test_mode=True, valid_hw=(h8, w8))
        flow = jax.lax.stop_gradient(
            mask_valid(roll(flow, -top, -left), (hv, wv)))
        with masked_trunk((hv, wv), pad_hw):
            refined = self.flowcnn(c_img_f, c_pre_f, flow, train)
        # spatial-conv-input interceptor leaves the refiner's final conv
        # output unmasked — cached/warped flow must be zero beyond valid
        return mask_valid(refined, (hv, wv))

    def _decode_feats(self, conv_out, train, feat_valid=None):
        """Decoder features that get flow-blended: ppm_out (plain) or the
        OCR 512-d feats; plus the deep-supervision logits (train only).

        ``feat_valid``: runtime OS-8 valid size for width-bucketed eval —
        threaded into the decoders' masked paths."""
        if self.ocr:
            feats, dsn = self.decoder(conv_out, train,
                                      feat_valid=feat_valid)
            return feats, dsn
        deepsup, _emb, ppm_out = self.decoder(conv_out, train,
                                              valid_hw=feat_valid)
        return ppm_out, deepsup

    def _classify(self, new_feat, train):
        if self.ocr:
            return self.head(new_feat)
        x = nn.relu(self.conv_last_1(self.conv_last_0(new_feat), train))
        x = self.conv_last_drop(x, train)
        return self.conv_last_cls(x)

    def encode_frame(self, img, train: bool = False, valid_hw=None):
        """One frame → (c5, decoder feats[, c4 for OCR's dsn]) — the
        streaming-eval cache (prev frames' features are consumed unblended,
        netwarp.py:196-217).

        ``valid_hw``: runtime true size inside a width-bucketed zero-padded
        ``img`` — trunk under the mask interceptor, decoder on its masked
        path; all cached maps are zero beyond their valid extents."""
        if valid_hw is not None:
            from ..ops.masked import (feature_valid, mask_valid,
                                      masked_trunk)
            pad_hw = img.shape[1:3]
            with masked_trunk(valid_hw, pad_hw):
                conv_out = self.encoder(img, train=train)
            # re-zero trunk outputs (unmasked under the spatial-conv-input
            # interceptor) — the decoders' masked paths and the streaming
            # cache both assume zero beyond the valid extents
            conv_out = [mask_valid(x, feature_valid(
                x.shape[1], x.shape[2], valid_hw, pad_hw))
                for x in conv_out]
            c5 = conv_out[-1]
            fv = feature_valid(c5.shape[1], c5.shape[2], valid_hw, pad_hw)
            feats, _ = self._decode_feats(conv_out, train, feat_valid=fv)
            if self.ocr:
                return c5, feats, conv_out[-2]
            return c5, feats
        conv_out = self.encoder(img, train=train)
        feats, _ = self._decode_feats(conv_out, train)
        if self.ocr:
            return conv_out[-1], feats, conv_out[-2]
        return conv_out[-1], feats

    def fuse_pair(self, target_img, prev_img, c5_t, c5_p, feats_p,
                  conv_out_t_rest=None, train: bool = False,
                  valid_hw=None):
        """Pair-specific work: flow, blends, target decode, classifier.

        conv_out_t_rest: the target's [c2, c3, c4] (needed by the OCR
        decoder's dsn head; None for the plain decoder).
        ``valid_hw``: runtime true size for width-bucketed masked eval —
        flow resizes/warps use runtime sizes (nearest-resize source math
        and the reference's (dim-1) warp normalization both depend on the
        TRUE sizes) and the classifier sees zero-masked inputs."""
        if valid_hw is not None:
            from ..ops.masked import (feature_valid, mask_valid,
                                      resize_nearest_rt)
            pad_hw = target_img.shape[1:3]
            flow = self._flow(target_img, prev_img, train,
                              valid_hw=valid_hw)
            fhw1 = c5_t.shape[1:3]
            fv1 = feature_valid(*fhw1, valid_hw, pad_hw)
            flow_1 = resize_nearest_rt(flow, fhw1, valid_hw, fv1)
            warp_1 = flowwarp(c5_p, flow_1.astype(c5_p.dtype),
                              valid_hw=fv1)
            new_c5_t = self.w0_0 * c5_t + self.w0_1 * warp_1
            conv_out = (list(conv_out_t_rest or [new_c5_t] * 3)[:3]
                        + [new_c5_t])
            feats_t, deepsup = self._decode_feats(conv_out, train,
                                                  feat_valid=fv1)
            fhw2 = feats_t.shape[1:3]
            fv2 = feature_valid(*fhw2, valid_hw, pad_hw)
            flow_2 = resize_nearest_rt(flow, fhw2, valid_hw, fv2)
            warp_2 = flowwarp(feats_p, flow_2.astype(feats_p.dtype),
                              valid_hw=fv2)
            new_feat = mask_valid(
                self.w1_0 * feats_t + self.w1_1 * warp_2, fv2)
            return self._classify(new_feat, train), deepsup
        flow = self._flow(target_img, prev_img, train)
        flow_1 = resize_nearest(flow, c5_t.shape[1:3])
        warp_1 = flowwarp(c5_p, flow_1.astype(c5_p.dtype))
        new_c5_t = self.w0_0 * c5_t + self.w0_1 * warp_1
        conv_out = list(conv_out_t_rest or [new_c5_t] * 3)[:3] + [new_c5_t]
        feats_t, deepsup = self._decode_feats(conv_out, train)
        flow_2 = resize_nearest(flow, feats_t.shape[1:3])
        warp_2 = flowwarp(feats_p, flow_2.astype(feats_p.dtype))
        new_feat = self.w1_0 * feats_t + self.w1_1 * warp_2
        return self._classify(new_feat, train), deepsup

    def __call__(self, imgs, train: bool = False):
        """imgs: [2, B, H, W, 3] — [prev, target] (target LAST)."""
        prev, target = imgs[0], imgs[1]
        b = target.shape[0]
        flow = self._flow(target, prev, train)

        enc_in = jnp.concatenate([target, prev], axis=0)  # target first!
        conv_out = self.encoder(enc_in, train=train)
        c5 = conv_out[-1]
        c5_t, c5_p = c5[:b], c5[b:]
        flow_1 = resize_nearest(flow, c5.shape[1:3])
        warp_1 = flowwarp(c5_p, flow_1.astype(c5.dtype))
        new_c5_t = self.w0_0 * c5_t + self.w0_1 * warp_1
        conv_out = list(conv_out)
        conv_out[-1] = jnp.concatenate([new_c5_t, c5_p], axis=0)

        feats, deepsup = self._decode_feats(conv_out, train)
        f_t, f_p = feats[:b], feats[b:]
        flow_2 = resize_nearest(flow, feats.shape[1:3])
        warp_2 = flowwarp(f_p, flow_2.astype(feats.dtype))
        new_feat = self.w1_0 * f_t + self.w1_1 * warp_2
        pred = self._classify(new_feat, train)
        return (pred,) if not train else (pred, deepsup)


def netwarp_loss(outs, batch, deep_sup_scale: float | None = 0.4,
                 ocr: bool = False):
    """Training loss (reference: netwarp.py:219-239, netwarp_ocr.py:280-299).

    batch["labels"]: [2, B, H, W] — [prev, target].
    """
    pred, deepsup = outs
    labels = batch["labels"]
    label = labels[-1]
    h, w = label.shape[1:3]
    # projected (transpose-trick) NLL — equal to resize-then-pick without
    # the full-res log-prob volumes (segmentation.py); acc argmaxes
    # upsampled raw logits (argmax-invariant to the log-softmax shift)
    from .segmentation import upsampled_logprob_loss_projected
    loss = upsampled_logprob_loss_projected(pred, label)
    logp = resize_bilinear(
        jax.lax.stop_gradient(pred).astype(jnp.float32), (h, w))
    if deep_sup_scale is not None:
        b = label.shape[0]
        if ocr:
            # quirk: dsn preds are [target, prev] but the reference's label
            # concat is [prev, target] (netwarp_ocr.py:287-295)
            all_label = jnp.concatenate([labels[0], labels[1]], axis=0)
            loss = loss + deep_sup_scale * upsampled_logprob_loss_projected(
                deepsup, all_label)
        else:
            loss = loss + deep_sup_scale * upsampled_logprob_loss_projected(
                deepsup[:b], label)
    acc_label = jnp.where(label == 255, -1, label)
    acc = pixel_acc(logp, acc_label)
    return loss, acc
