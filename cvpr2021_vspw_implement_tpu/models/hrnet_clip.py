"""HRNetV2-clip: early temporal fusion with TimeAtten
(reference: models/hrnet_clip.py:26-519, SegmentationModule_clip at
models/models.py:478-510).

Clip frames pass the stem + layer1 with frozen BN statistics and no
gradient (hrnet_clip.py:443-453); with ``clip_middle`` the target's layer1
output is fused with a cosine-similarity-softmax-weighted mean of the clip
features (``TimeAtten``, hrnet_clip.py:26-60) before the HRNet stages.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..ops.pooling import global_avg_pool
from ..utils.metrics import pixel_acc
from .hrnet import HRNetStages, HRNetStem
from .layers import Conv
from .segmentation import nll_from_logprobs


class TimeAtten(nn.Module):
    """Cosine-similarity-weighted clip fusion (hrnet_clip.py:26-60)."""

    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, c_emb, clip_embs, feat_valid=None):
        """c_emb: [B, H, W, C]; clip_embs: [T, B, H, W, C].

        ``feat_valid``: runtime valid (rows, cols) of the feature maps for
        width-bucketed masked eval — the cosine queries/keys average over
        the valid region only; the blend/concat/1x1 chain is pixelwise."""
        if feat_valid is not None:
            from ..ops.masked import global_avg_pool_rt
            pool = lambda v: global_avg_pool_rt(v, feat_valid,
                                                keepdims=False)
        else:
            pool = lambda v: global_avg_pool(v, keepdims=False)
        q = pool(c_emb)                                      # [B, C]
        q = q / (jnp.linalg.norm(q.astype(jnp.float32), axis=1,
                                 keepdims=True) + 1e-12)
        ks = pool(clip_embs.reshape(-1, *clip_embs.shape[2:])).reshape(
            clip_embs.shape[0], clip_embs.shape[1], -1)
        ks = ks / (jnp.linalg.norm(ks.astype(jnp.float32), axis=2,
                                   keepdims=True) + 1e-12)
        w = jnp.einsum("bc,tbc->tb", q.astype(jnp.float32), ks)
        w = jax.nn.softmax(w, axis=0)                        # over frames
        blended = jnp.einsum("tb,tbhwc->bhwc", w,
                             clip_embs.astype(jnp.float32)).astype(c_emb.dtype)
        # reference divides by T via mean AFTER weighting
        blended = blended / clip_embs.shape[0]
        out = jnp.concatenate([c_emb, blended], axis=-1)
        return Conv(self.out_dim, 1, dtype=self.dtype, name="conv1")(out)


class HRNetV2Clip(nn.Module):
    dtype: Any = None
    args: Any = None

    @nn.compact
    def __call__(self, c_img, clip_imgs, train: bool = False,
                 return_feature_maps: bool = True, valid_hw=None):
        """c_img [B,H,W,3]; clip_imgs [T,B,H,W,3].

        ``valid_hw``: runtime (rows, cols) of the TRUE frames inside
        width-bucketed zero-padded inputs (eval only) — masked stem +
        valid-region TimeAtten pooling + runtime-masked HRNet fusion
        resizes (models/hrnet.py)."""
        stem = HRNetStem(dtype=self.dtype, name="stem")
        t, b = clip_imgs.shape[:2]
        flat = clip_imgs.reshape(t * b, *clip_imgs.shape[2:])
        pad_hw = c_img.shape[1:3]
        if valid_hw is not None:
            from ..ops.masked import (feature_valid, mask_valid,
                                      masked_trunk)
            ctx = masked_trunk(valid_hw, pad_hw)
        else:
            import contextlib
            ctx = contextlib.nullcontext()
        with ctx:
            # clip frames: frozen BN stats + no grad (hrnet_clip.py:443-453)
            clip_feat = jax.lax.stop_gradient(stem(flat, train=False))
            clip_feat = clip_feat.reshape(t, b, *clip_feat.shape[1:])
            x = stem(c_img, train=train)
            if self.args is None or getattr(self.args, "clip_middle", True):
                fv = feature_valid(x.shape[1], x.shape[2], valid_hw,
                                   pad_hw) if valid_hw is not None else None
                x = TimeAtten(x.shape[-1], dtype=self.dtype,
                              name="time_atten")(x, clip_feat,
                                                 feat_valid=fv)
            out = HRNetStages(dtype=self.dtype, name="stages")(
                x, train, valid_hw=valid_hw,
                pad_hw=pad_hw if valid_hw is not None else None)
        if valid_hw is not None:
            # trunk outputs are unmasked under the spatial-conv-input
            # interceptor — the decoder's masked path expects zeros beyond
            # the valid extent
            out = mask_valid(out, feature_valid(out.shape[1], out.shape[2],
                                                valid_hw, pad_hw))
        return [out]


class SegmentationModuleClip(nn.Module):
    """Clip-encoder + decoder wrapper (models/models.py:478-510)."""

    encoder: nn.Module
    decoder: nn.Module

    def __call__(self, c_img, clip_imgs, train: bool = False,
                 valid_hw=None):
        if valid_hw is not None:
            from ..ops.masked import feature_valid
            conv_out = self.encoder(c_img, clip_imgs, train=train,
                                    valid_hw=valid_hw)
            c = conv_out[-1]
            fv = feature_valid(c.shape[1], c.shape[2], valid_hw,
                               c_img.shape[1:3])
            return self.decoder(conv_out, train=train, valid_hw=fv)
        conv_out = self.encoder(c_img, clip_imgs, train=train)
        return self.decoder(conv_out, train=train)


def seg_clip_loss(outs, batch, deep_sup_scale=None):
    """Target-frame loss (models/models.py:487-503); labels [T+1,B,H,W]
    target last (the context labels are unused by this method)."""
    label = batch["labels"][-1]
    h, w = label.shape[1:3]
    logp = resize_bilinear(
        jax.nn.log_softmax(outs[0].astype(jnp.float32), axis=-1), (h, w))
    loss = nll_from_logprobs(logp, label)
    acc_label = jnp.where(label == 255, -1, label)
    return loss, pixel_acc(logp, acc_label)
