"""our_warp: local cost-volume feature warping (reference: models/warp_our.py,
ClipWarpNet wrapper at models/models.py:116-282).

WarpNet embeds the decoder's 512-d clip features twice (128-d for distance
maps, 256-d for the warped features), builds local squared-distance cost
volumes between the target and each context frame at radii ``max_distances``,
turns them into aggregation weights (sigmoid / inverse-distance softmax /
"nearest"), warp-aggregates the context features, and means everything into
the target embedding.

Reference quirks preserved:
  * all aggregation modes divide by k^2 (avgpool over the window) even with
    softmax weights (warp_our.py:139-152);
  * ``distnearest`` gathers at the argMAX distance (warp_our.py:145-151) —
    i.e. the farthest window position (with +1e20 at out-of-bounds) — a
    faithful copy of the reference behavior;
  * the distance maps come from emb_2 (128-d) while warping moves emb (256-d).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..ops.local_pairwise import (local_pairwise_dist, local_weighted_aggregate,
                                  local_window_gather)
from ..utils.metrics import pixel_acc
from .decoders import PPMDeepsupClip, _bn_bias_init
from .layers import Conv, ConvBNReLU, Dropout2d
from .segmentation import nll_from_logprobs


def warp_one_scale(dist: jnp.ndarray, other: jnp.ndarray, r: int,
                   distsoftmax: bool, distnearest: bool, temp: float,
                   emb_dim: int) -> jnp.ndarray:
    """One (scale, frame) aggregation (reference: warp_our.py:131-160)."""
    b, h, w, k, _ = dist.shape
    if distsoftmax:
        flat = dist.reshape(b, h, w, k * k)
        wts = jax.nn.softmax(1.0 / (flat * temp + 1e-5), axis=-1)
        wts = wts.reshape(b, h, w, k, k)
        return local_weighted_aggregate(other, wts, r) / (k * k)
    if distnearest:
        flat = dist.reshape(b, h, w, k * k)
        idx = jnp.argmax(flat, axis=-1)                       # quirk: max
        windows = local_window_gather(other, r).reshape(b, h, w, k * k, -1)
        return jnp.take_along_axis(
            windows, idx[..., None, None].repeat(windows.shape[-1], -1),
            axis=3)[:, :, :, 0, :]
    wts = 1.0 - (jax.nn.sigmoid(dist.astype(jnp.float32)) - 0.5) * 2.0
    return local_weighted_aggregate(other, wts, r) / (k * k)


class WarpNet(nn.Module):
    """Cost-volume warping head over clip embeddings (warp_our.py:84-189)."""

    num_class: int
    clip_num: int                       # T+1 frames total
    max_distances: Sequence[int] = (10,)
    emb_dim: int = 256
    fc_dim: int = 128                   # emb_2 (distance) width
    linear_combine: bool = False
    distsoftmax: bool = False
    distnearest: bool = False
    temp: float = 3.0
    dtype: Any = None

    @nn.compact
    def __call__(self, clip_embs, train: bool = False, feat_valid=None):
        """clip_embs: [(T+1)*B, h, w, 512], target frame LAST group.

        Returns (logits [B, h, w, K], emb2 [(T+1)*B, h, w, fc_dim]).

        ``feat_valid``: runtime valid (rows, cols) of the feature maps for
        width-bucketed masked eval — the cost volumes treat at-or-beyond-
        valid positions exactly like the unpadded run's out-of-bounds
        (|y|^2 = 1e20, y = 0 — ops/local_pairwise.py), so every
        aggregation mode (sigmoid / distsoftmax / the distnearest argmax
        quirk) is exact on the valid region.  Runs the banded-matmul XLA
        path (the fused Pallas kernels take static shapes only)."""
        t1 = self.clip_num
        tb = clip_embs.shape[0]
        b = tb // t1
        emb2 = ConvBNReLU(self.fc_dim, dtype=self.dtype,
                          bn_bias_init=_bn_bias_init, name="emb_2")(clip_embs, train)
        emb_s = ConvBNReLU(self.emb_dim, dtype=self.dtype,
                           bn_bias_init=_bn_bias_init, name="emb")(clip_embs, train)
        if feat_valid is not None:
            from ..ops.masked import mask_valid
            emb2 = mask_valid(emb2, feat_valid)
            emb_s = mask_valid(emb_s, feat_valid)
        e2 = emb2.reshape(t1, b, *emb2.shape[1:])
        es = emb_s.reshape(t1, b, *emb_s.shape[1:])
        target_e2, target_es = e2[-1], es[-1]

        # every aggregation mode has a fused Pallas kernel on TPU
        # (ops/pallas/local_agg.py): no HBM distance volume, MXU matmuls only
        use_fused = (feat_valid is None
                     and jax.default_backend() not in ("cpu",)
                     and os.environ.get("VSPW_TPU_PALLAS", "1") == "1")

        final = [target_es]
        for f in range(t1 - 1):
            per_scale = []
            for r in self.max_distances:
                if use_fused and self.distsoftmax:
                    from ..ops.pallas.local_agg import local_softmax_aggregate
                    per_scale.append(local_softmax_aggregate(
                        target_e2, e2[f], es[f], r, temp=self.temp))
                elif use_fused and self.distnearest:
                    from ..ops.pallas.local_agg import local_nearest_aggregate
                    per_scale.append(local_nearest_aggregate(
                        target_e2, e2[f], es[f], r))
                elif use_fused:
                    from ..ops.pallas.local_agg import local_sigmoid_aggregate
                    per_scale.append(local_sigmoid_aggregate(
                        target_e2, e2[f], es[f], r))
                else:
                    dist = local_pairwise_dist(target_e2, e2[f], r,
                                               valid_hw=feat_valid)
                    per_scale.append(warp_one_scale(
                        dist, es[f], r, self.distsoftmax, self.distnearest,
                        self.temp, self.emb_dim))
            final.append(jnp.mean(jnp.stack(per_scale, 0), axis=0))

        if self.linear_combine:
            combined = []
            for i, emb in enumerate(final):
                wi = self.param(f"w{i}",
                                nn.initializers.ones if i == 0
                                else nn.initializers.constant(0.2),
                                (self.emb_dim,))
                combined.append(wi * emb)
            final = combined
        fea = jnp.mean(jnp.stack(final, 0), axis=0)
        fea = Dropout2d(0.1, name="last_drop")(fea, train)
        logits = Conv(self.num_class, 1, dtype=self.dtype,
                      name="last_conv")(fea)
        return logits, emb2


class ClipWarpNet(nn.Module):
    """Encoder + PPM-clip decoder + WarpNet (models/models.py:116-282)."""

    encoder: nn.Module
    num_class: int
    fc_dim: int = 2048
    args: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, imgs, train: bool = False, valid_hw=None):
        """imgs: [T+1, B, H, W, 3], target LAST.

        ``valid_hw``: runtime (rows, cols) of the TRUE frames inside
        width-bucketed zero-padded ``imgs`` (eval only) — masked trunk +
        valid-region PPM + out-of-bounds-exact cost volumes (WarpNet)."""
        t1, b, h, w, _ = imgs.shape
        flat = imgs.reshape(t1 * b, h, w, imgs.shape[-1])
        fix = bool(getattr(self.args, "fix", False))
        enc_dec_train = train and not fix

        import contextlib
        fv = None
        feat_ctx = contextlib.nullcontext()
        if valid_hw is not None:
            from ..ops.masked import (feature_valid, mask_interceptor,
                                      mask_valid, masked_trunk)
            # interceptor covers the STRIDE-PYRAMID trunk only — the
            # decoder's pooled-branch convs (1/2/3/6 maps) do not follow
            # the input ratio rule and handle masking via valid_hw
            with masked_trunk(valid_hw, (h, w)):
                conv_out = self.encoder(flat, train=enc_dec_train)
            # re-zero trunk outputs (unmasked under the spatial-conv-input
            # interceptor) before the un-intercepted decoder convs
            conv_out = [mask_valid(x, feature_valid(
                x.shape[1], x.shape[2], valid_hw, (h, w)))
                for x in conv_out]
            c5 = conv_out[-1]
            fv = feature_valid(c5.shape[1], c5.shape[2], valid_hw, (h, w))
            # the warp head's convs all sit at the c5 resolution: a
            # FEATURE-LEVEL interceptor (pad == the feature grid itself)
            # re-zeros every conv boundary there exactly
            feat_ctx = nn.intercept_methods(
                mask_interceptor(fv, c5.shape[1:3]))
        else:
            conv_out = self.encoder(flat, train=enc_dec_train)
        deepsup, clip_embs, _ppm = PPMDeepsupClip(
            self.num_class, self.fc_dim, dtype=self.dtype,
            name="decoder")(conv_out, enc_dec_train, valid_hw=fv)
        if fix:
            if deepsup is not None:
                deepsup = jax.lax.stop_gradient(deepsup)
            clip_embs = jax.lax.stop_gradient(clip_embs)

        warp = WarpNet(
            num_class=self.num_class, clip_num=t1,
            max_distances=tuple(getattr(self.args, "max_distances", [10])),
            linear_combine=getattr(self.args, "linear_combine", False),
            distsoftmax=getattr(self.args, "distsoftmax", False),
            distnearest=getattr(self.args, "distnearest", False),
            temp=getattr(self.args, "temp", 3.0),
            dtype=self.dtype, name="prop_clip")
        with feat_ctx:
            pred, emb2 = warp(clip_embs, train, feat_valid=fv)
        if not train:
            return (pred,)
        allsup_pred = Dropout2d(0.1, name="allsup_drop")(emb2, train)
        allsup_pred = Conv(self.num_class, 1, dtype=self.dtype,
                           name="last_layer")(allsup_pred)
        return {"pred": pred, "deepsup": deepsup, "allsup": allsup_pred}


def clip_warp_loss(outs, batch, deep_sup_scale: float | None = 0.4,
                   allsup: bool = False, allsup_scale: float = 0.3,
                   fix: bool = False):
    """Training loss (reference: models/models.py:183-267).

    batch["labels"]: [T+1, B, H, W], target last.
    """
    labels = batch["labels"]
    t1, b, h, w = labels.shape
    label = labels[-1]
    logp = resize_bilinear(
        jax.nn.log_softmax(outs["pred"].astype(jnp.float32), axis=-1), (h, w))
    loss = nll_from_logprobs(logp, label)
    if allsup:
        all_label = labels.reshape(t1 * b, h, w)
        alogp = resize_bilinear(
            jax.nn.log_softmax(outs["allsup"].astype(jnp.float32), axis=-1),
            (h, w))
        loss_a = nll_from_logprobs(alogp, all_label)
        if deep_sup_scale is not None and not fix:
            dlogp = resize_bilinear(
                jax.nn.log_softmax(outs["deepsup"].astype(jnp.float32),
                                   axis=-1), (h, w))
            loss_d = nll_from_logprobs(dlogp, all_label)
            loss = loss + (loss_a + loss_d * deep_sup_scale) * allsup_scale
        else:
            loss = loss + loss_a * allsup_scale
    acc_label = jnp.where(label == 255, -1, label)
    acc = pixel_acc(logp, acc_label)
    return loss, acc
