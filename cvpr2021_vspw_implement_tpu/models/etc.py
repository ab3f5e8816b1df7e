"""ETC: temporal-consistency training (reference: models/ETC.py,
models/ETC_ocr.py).

Training computes per-frame predictions for (prev, target), the usual
NLL + deep-supervision loss on the target frame, plus a temporal-consistency
MSE between the target prediction and the flow-warped previous prediction,
masked by the occlusion estimate ``exp(-|sum_c(I_t - warp(I_{t-1}))|)``
(ETC.py:170-178).  Inference is plain single-frame (ETC.py:183-189).

Quirks preserved: flow stays in full-res pixel units; the warped image for
the occlusion mask is the *normalized* previous frame; the OCR variant's
deep supervision pairs preds [target, prev] against labels [prev, target]
(ETC_ocr.py:203-210).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear, resize_nearest
from ..ops.warp import flowwarp
from ..utils.metrics import pixel_acc
from .decoders import PPMDeepsupClip, _bn_bias_init
from .layers import BatchNorm2d, Conv, Dropout2d
from .netwarp import SpatialOCRAsDec, denormalize_255
from .raft import RAFT, pad_to_multiple_of_8, unpad
from .segmentation import nll_from_logprobs


class ETC(nn.Module):
    encoder: nn.Module
    num_class: int
    fc_dim: int = 2048
    ocr: bool = False
    raft_iters: int = 20
    dtype: Any = None

    def _decode(self, conv_out, train, feat_valid=None):
        if self.ocr:
            feats, deepsup = SpatialOCRAsDec(self.num_class, dtype=self.dtype,
                                             name="decoder")(
                conv_out, train, feat_valid=feat_valid)
            pred = Conv(self.num_class, 1, dtype=self.dtype,
                        name="conv_last_cls")(feats)
            return pred, deepsup
        deepsup, _emb, ppm_out = PPMDeepsupClip(
            self.num_class, self.fc_dim, dtype=self.dtype,
            name="decoder")(conv_out, train, valid_hw=feat_valid)
        x = Conv(512, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="conv_last_0")(ppm_out)
        x = BatchNorm2d(512, dtype=self.dtype, bias_init=_bn_bias_init,
                        name="conv_last_1")(x, train)
        x = nn.relu(x)
        x = Dropout2d(0.1, name="conv_last_drop")(x, train)
        pred = Conv(self.num_class, 1, dtype=self.dtype,
                    name="conv_last_cls")(x)
        return pred, deepsup

    @nn.compact
    def __call__(self, imgs, train: bool = False, valid_hw=None):
        """imgs: [2, B, H, W, 3] — [prev, target] in training;
        only imgs[-1] is used at inference (single-frame).

        ``valid_hw``: runtime true size for width-bucketed masked eval
        (inference only) — trunk under the mask interceptor, decoder on
        its masked path; the masked PPM concat keeps the conv_last_0 3x3
        exact on the valid region (ops/masked.py)."""
        target = imgs[-1]
        if not train:
            if valid_hw is not None:
                from ..ops.masked import (feature_valid, mask_valid,
                                          masked_trunk)
                pad_hw = target.shape[1:3]
                with masked_trunk(valid_hw, pad_hw):
                    conv_out = self.encoder(target, train=False)
                # spatial-conv-input interceptor leaves trunk outputs
                # unmasked — re-zero the levels the decoder convs read
                conv_out = [mask_valid(x, feature_valid(
                    x.shape[1], x.shape[2], valid_hw, pad_hw))
                    for x in conv_out]
                c5 = conv_out[-1]
                fv = feature_valid(c5.shape[1], c5.shape[2], valid_hw,
                                   pad_hw)
                pred, _ = self._decode(conv_out, False, feat_valid=fv)
                return (pred,)
            conv_out = self.encoder(target, train=False)
            pred, _ = self._decode(conv_out, False)
            return (pred,)

        prev = imgs[0]
        b = target.shape[0]
        c_img_f = denormalize_255(target)
        c_pre_f = denormalize_255(prev)
        pad_t, pads = pad_to_multiple_of_8(c_img_f)
        pad_p, _ = pad_to_multiple_of_8(c_pre_f)
        _, flow = RAFT(iters=self.raft_iters, dtype=self.dtype,
                       name="raft")(pad_t, pad_p, test_mode=True)
        flow = jax.lax.stop_gradient(unpad(flow, pads))

        enc_in = jnp.concatenate([target, prev], axis=0)
        conv_out = self.encoder(enc_in, train=train)
        pred, deepsup = self._decode(conv_out, train)
        return {"pred_t": pred[:b], "pred_p": pred[b:],
                "deepsup": deepsup, "flow": flow}


def etc_loss(outs, batch, deep_sup_scale: float | None = 0.4,
             st_weight: float = 0.1, ocr: bool = False):
    """Training loss (reference: ETC.py:141-181, ETC_ocr.py:160-222)."""
    labels = batch["labels"]
    imgs = batch["img"]
    prev_img, target_img = imgs[0], imgs[1]
    label = labels[-1]
    h, w = label.shape[1:3]
    b = label.shape[0]

    pred_t, pred_p = outs["pred_t"], outs["pred_p"]
    # projected (transpose-trick) main NLL — equal to resize-then-pick
    # without the full-res log-prob volume; the ST term below already
    # materializes the upsampled raw logits, which also serve the acc
    # argmax (invariant to the per-pixel log-softmax shift)
    from .segmentation import upsampled_logprob_loss_projected
    loss = upsampled_logprob_loss_projected(pred_t, label)

    if deep_sup_scale is not None:
        if ocr:
            # preds [target, prev] vs labels [prev, target] (reference quirk)
            all_label = jnp.concatenate([labels[0], labels[1]], axis=0)
            loss = loss + deep_sup_scale * upsampled_logprob_loss_projected(
                outs["deepsup"], all_label)
        else:
            loss = loss + deep_sup_scale * upsampled_logprob_loss_projected(
                outs["deepsup"][:b], label)

    # temporal consistency (ETC.py:170-178)
    flow = resize_nearest(outs["flow"], (h, w)).astype(jnp.float32)
    pred_t_up = resize_bilinear(pred_t.astype(jnp.float32), (h, w))
    pred_p_up = resize_bilinear(pred_p.astype(jnp.float32), (h, w))
    warp_img = flowwarp(prev_img.astype(jnp.float32), flow)
    warp_pred = flowwarp(pred_p_up, flow)
    noc = jnp.exp(-jnp.abs(jnp.sum(target_img.astype(jnp.float32) - warp_img,
                                   axis=-1)))[..., None]
    st = jnp.mean(jnp.square(pred_t_up * noc - warp_pred * noc))
    loss = loss + st_weight * st

    acc_label = jnp.where(label == 255, -1, label)
    acc = pixel_acc(jax.lax.stop_gradient(pred_t_up), acc_label)
    return loss, acc
