"""our_warp_merge: cost volumes on C4 embeddings, per-neighbor merged preds
(reference: models/warp_our_merge.py:53-270).

Distance maps come from a 256-d embedding of C4 (1024-ch) while the warped
features embed the decoder's 512-d clip features; each context frame yields
a prediction from cat(target_emb, warp) through ``last_layer2``; inference
averages those with the per-frame head on the target.

Reference quirks preserved:
  * the per-frame loop returns after the FIRST context frame
    (warp_our_merge.py:262 — the ``return`` sits inside the loop), so only
    one neighbor contributes;
  * both the allsup and deepsup losses are scaled by deep_sup_scale
    (warp_our_merge.py:99: ``(loss_a + loss_deepsup) * deep_sup_scale``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..ops.local_pairwise import local_pairwise_dist
from ..utils.metrics import pixel_acc
from .decoders import PPMClip, _bn_bias_init
from .layers import Conv, ConvBNReLU, Dropout2d
from .segmentation import nll_from_logprobs
from .warp_our import warp_one_scale


class WarpNetMerge(nn.Module):
    num_class: int
    clip_num: int
    max_distances: tuple = (10,)
    emb_dim: int = 256
    distsoftmax: bool = False
    distnearest: bool = False
    temp: float = 3.0
    dtype: Any = None

    @nn.compact
    def __call__(self, clip_embs, conv4, train: bool = False,
                 feat_valid=None):
        """clip_embs [(T+1)B, h, w, 512]; conv4 [(T+1)B, h, w, 1024].

        Returns (per-neighbor preds list, emb [(T+1)B,h,w,256], deepsup).

        ``feat_valid``: runtime valid (rows, cols) for width-bucketed
        masked eval — cost volumes get the unpadded run's out-of-bounds
        treatment beyond the valid region (ops/local_pairwise.py)."""
        t1 = self.clip_num
        tb = clip_embs.shape[0]
        b = tb // t1
        emb = ConvBNReLU(self.emb_dim, dtype=self.dtype,
                         bn_bias_init=_bn_bias_init, name="emb")(clip_embs, train)
        c4e = ConvBNReLU(self.emb_dim, dtype=self.dtype,
                         bn_bias_init=_bn_bias_init, name="emb2")(conv4, train)
        if feat_valid is not None:
            from ..ops.masked import mask_valid
            emb = mask_valid(emb, feat_valid)
            c4e = mask_valid(c4e, feat_valid)
        e = emb.reshape(t1, b, *emb.shape[1:])
        c4 = c4e.reshape(t1, b, *c4e.shape[1:])
        target_e, target_c4 = e[-1], c4[-1]

        deepsup = Dropout2d(0.1, name="ds_drop")(c4e, train)
        deepsup = Conv(self.num_class, 1, dtype=self.dtype,
                       name="last_layer")(deepsup)

        preds = []
        # reference quirk: only the first context frame is processed
        for f in range(min(t1 - 1, 1)):
            per_scale = []
            for r in self.max_distances:
                dist = local_pairwise_dist(target_c4, c4[f], r,
                                           valid_hw=feat_valid)
                per_scale.append(warp_one_scale(
                    dist, e[f], r, self.distsoftmax, self.distnearest,
                    self.temp, self.emb_dim))
            warp = jnp.mean(jnp.stack(per_scale, 0), axis=0)
            x = jnp.concatenate([target_e, warp], axis=-1)
            x = Dropout2d(0.1, name=f"merge_drop_{f}")(x, train)
            preds.append(Conv(self.num_class, 1, dtype=self.dtype,
                              name="last_layer2")(x))
        return preds, emb, deepsup


class OurWarpMerge(nn.Module):
    encoder: nn.Module
    num_class: int
    fc_dim: int = 2048
    args: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, imgs, train: bool = False, valid_hw=None):
        """``valid_hw``: runtime (rows, cols) of the TRUE frames inside
        width-bucketed zero-padded ``imgs`` (eval only)."""
        t1, b, h, w, _ = imgs.shape
        flat = imgs.reshape(t1 * b, h, w, imgs.shape[-1])
        import contextlib
        fv = None
        feat_ctx = contextlib.nullcontext()
        if valid_hw is not None:
            from ..ops.masked import (feature_valid, mask_interceptor,
                                      mask_valid, masked_trunk)
            # trunk interceptor covers the stride pyramid; the decoder's
            # pooled branches handle masking via valid_hw; the warp/head
            # convs sit at the c5 resolution under a FEATURE-LEVEL
            # interceptor (see warp_our.py)
            with masked_trunk(valid_hw, (h, w)):
                conv_out = self.encoder(flat, train=train)
            conv_out = [mask_valid(x, feature_valid(
                x.shape[1], x.shape[2], valid_hw, (h, w)))
                for x in conv_out]
            c5 = conv_out[-1]
            fv = feature_valid(c5.shape[1], c5.shape[2], valid_hw, (h, w))
            feat_ctx = nn.intercept_methods(
                mask_interceptor(fv, c5.shape[1:3]))
        else:
            conv_out = self.encoder(flat, train=train)
        clip_embs = PPMClip(self.num_class, self.fc_dim,
                            dtype=self.dtype,
                            name="decoder")(conv_out, train, valid_hw=fv)
        warp = WarpNetMerge(
            num_class=self.num_class, clip_num=t1,
            max_distances=tuple(getattr(self.args, "max_distances",
                                        [10])),
            distsoftmax=getattr(self.args, "distsoftmax", False),
            distnearest=getattr(self.args, "distnearest", False),
            temp=getattr(self.args, "temp", 3.0),
            dtype=self.dtype, name="prop_clip")
        with feat_ctx:
            preds, emb, deepsup = warp(clip_embs, conv_out[-2], train,
                                       feat_valid=fv)

            head = Dropout2d(0.1, name="head_drop")(emb, train)
            pred_s = Conv(self.num_class, 1, dtype=self.dtype,
                          name="last_layer")(head)
        if train:
            return {"preds_c": preds, "pred_s": pred_s, "deepsup": deepsup}
        ps = pred_s.reshape(t1, b, *pred_s.shape[1:])
        out = jnp.mean(jnp.stack([ps[-1]] + preds, 0), axis=0)
        return (out,)


def warp_merge_loss(outs, batch, deep_sup_scale: float | None = 0.4):
    """Training loss (reference: warp_our_merge.py:78-110)."""
    labels = batch["labels"]
    t1, b, h, w = labels.shape
    all_label = labels.reshape(t1 * b, h, w)
    label = labels[-1]

    alogp = resize_bilinear(
        jax.nn.log_softmax(outs["pred_s"].astype(jnp.float32), axis=-1), (h, w))
    loss_a = nll_from_logprobs(alogp, all_label)
    dlogp = resize_bilinear(
        jax.nn.log_softmax(outs["deepsup"].astype(jnp.float32), axis=-1), (h, w))
    loss_d = nll_from_logprobs(dlogp, all_label)
    scale = deep_sup_scale if deep_sup_scale is not None else 1.0
    loss_ = (loss_a + loss_d) * scale

    losses, logp_c = [], None
    for pred_c in outs["preds_c"]:
        logp_c = resize_bilinear(
            jax.nn.log_softmax(pred_c.astype(jnp.float32), axis=-1), (h, w))
        losses.append(nll_from_logprobs(logp_c, label))
    loss = sum(losses) / len(losses) + loss_
    acc_label = jnp.where(label == 255, -1, label)
    acc = pixel_acc(logp_c, acc_label)
    return loss, acc
