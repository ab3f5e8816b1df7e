"""PropNet: label propagation via local min-distance matching
(reference: models/propnet.py:19-267).

For each context frame, per-frame predictions give hard labels; for every
target pixel and every class, the propagated score is the MINIMUM
sigmoid-squashed embedding distance to a window position of the context
frame carrying that class (1.0 if absent).  The propagated class map is
concatenated with the target embedding and refined by a stack of separable
convs (``SegBlock``).  Inference averages the per-frame SegBlock logits with
the per-frame head's logits.

TPU formulation: the class-masked window min is one fused
``where(label==c, d, 1).min(window)`` reduction — XLA fuses the mask into
the reduce, avoiding the reference's [N,H,W,k^2,C] materialization
(propnet.py:74-80).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear, resize_nearest
from ..ops.local_pairwise import local_pairwise_dist, local_window_gather
from ..utils.metrics import pixel_acc
from .decoders import PPMDeepsupClip, _bn_bias_init
from .layers import BatchNorm2d, Conv, ConvBNReLU, Dropout2d
from .segmentation import nll_from_logprobs


def prop_pred(prev_emb, query_emb, prev_labels, max_distance: int,
              num_class: int, feat_valid=None) -> jnp.ndarray:
    """Propagated per-class min-distance map (reference: propnet.py:54-81).

    prev_emb/query_emb: [B, h, w, C]; prev_labels: [B, H, W] int
    → [B, h, w, num_class] in [-1, 1] (1 where the class is absent).

    ``feat_valid``: runtime valid (rows, cols) for width-bucketed masked
    eval.  Beyond-valid window positions get distance 1e20 →
    sigmoid-squashed 1.0 == the "class absent" default, so whatever label
    the padded region appears to carry contributes exactly the absent
    score and the min matches the unpadded run.
    """
    b, h, w, _ = prev_emb.shape
    d = local_pairwise_dist(query_emb, prev_emb, max_distance,
                            valid_hw=feat_valid)
    d = (jax.nn.sigmoid(d.astype(jnp.float32)) - 0.5) * 2.0
    k = 2 * max_distance + 1
    d = d.reshape(b, h, w, k * k)

    labels = resize_nearest(prev_labels[..., None].astype(jnp.float32),
                            (h, w))
    lwin = local_window_gather(labels, max_distance, pad_value=-1.0)
    lwin = lwin.reshape(b, h, w, k * k)

    classes = jnp.arange(num_class, dtype=jnp.float32)
    masked = jnp.where(lwin[..., None] == classes, d[..., None], 1.0)
    return jnp.min(masked, axis=3)                           # [B,h,w,C]


class SplitSeparableConv(nn.Module):
    """Depthwise kxk + pointwise 1x1, each with BN+ReLU (propnet.py:84-103)."""

    out_dim: int
    kernel_size: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dim = x.shape[-1]
        x = Conv(in_dim, self.kernel_size, padding=(self.kernel_size - 1) // 2,
                 groups=in_dim, dtype=self.dtype,
                 name="conv1")(x)
        x = BatchNorm2d(in_dim, dtype=self.dtype, bias_init=_bn_bias_init,
                        name="bn1")(x, train)
        x = nn.relu(x)
        x = Conv(self.out_dim, 1, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm2d(self.out_dim, dtype=self.dtype,
                        bias_init=_bn_bias_init, name="bn2")(x, train)
        return nn.relu(x)


class SegBlock(nn.Module):
    num_class: int
    emb_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(4):
            x = SplitSeparableConv(self.emb_dim, dtype=self.dtype,
                                   name=f"conv{i + 1}")(x, train)
        return Conv(self.num_class, 1, dtype=self.dtype, name="last_layer")(x)


class PropNet(nn.Module):
    encoder: nn.Module
    num_class: int
    fc_dim: int = 2048
    emb_dim: int = 256
    args: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, imgs, train: bool = False, valid_hw=None):
        """imgs: [T+1, B, H, W, 3], target LAST.

        ``valid_hw``: runtime (rows, cols) of the TRUE frames inside
        width-bucketed zero-padded ``imgs`` (eval only) — masked trunk +
        valid-region PPM + absent-exact propagation (``prop_pred``)."""
        t1, b, h, w, _ = imgs.shape
        flat = imgs.reshape(t1 * b, h, w, imgs.shape[-1])
        import contextlib
        fv = None
        feat_ctx = contextlib.nullcontext()
        if valid_hw is not None:
            from ..ops.masked import (feature_valid, mask_interceptor,
                                      mask_valid, masked_trunk)
            # trunk interceptor covers the stride pyramid; decoder pooled
            # branches handle masking via valid_hw; the propagation heads
            # (emb/emb2/segblock) all sit at the c5 resolution and run
            # under a FEATURE-LEVEL interceptor (see warp_our.py)
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
        deepsup, clip_embs, _ = PPMDeepsupClip(
            self.num_class, self.fc_dim, dtype=self.dtype,
            name="decoder")(conv_out, train, valid_hw=fv)

        with feat_ctx:
            embs = ConvBNReLU(self.emb_dim, dtype=self.dtype,
                              bn_bias_init=_bn_bias_init,
                              name="emb")(clip_embs, train)
            pred_s = Dropout2d(0.1, name="last_drop")(embs, train)
            pred_s = Conv(self.num_class, 1, dtype=self.dtype,
                          name="last_layer")(pred_s)

            embs2 = ConvBNReLU(self.emb_dim, dtype=self.dtype,
                               bn_bias_init=_bn_bias_init,
                               name="emb2")(clip_embs, train)
            e2 = embs2.reshape(t1, b, *embs2.shape[1:])
            c_emb = e2[-1]
            max_distance = int(getattr(self.args, "max_distances", [10])[0])

            segblock = SegBlock(self.num_class, self.emb_dim,
                                dtype=self.dtype, name="segblock")

            if train:
                # per-frame hard labels from the per-frame head at FULL res
                # (reference: propnet.py:205-209)
                logp = jax.nn.log_softmax(pred_s.astype(jnp.float32),
                                          axis=-1)
                logp_up = resize_bilinear(logp, (h, w))
                pred_labels = jnp.argmax(logp_up, axis=-1)  # [(T+1)B, H, W]
                pl = pred_labels.reshape(t1, b, h, w)
                preds_c = []
                for f in range(t1 - 1):
                    prop = prop_pred(e2[f], c_emb, pl[f], max_distance,
                                     self.num_class)
                    x = jnp.concatenate([c_emb, prop.astype(c_emb.dtype)],
                                        axis=-1)
                    preds_c.append(segblock(x, train))
                return {"pred_s": pred_s, "deepsup": deepsup,
                        "preds_c": preds_c}

            # inference: average segblock logits over frames + per-frame head
            ps = pred_s.reshape(t1, b, *pred_s.shape[1:])
            out = [ps[-1]]
            for f in range(t1 - 1):
                other_l = jnp.argmax(ps[f], axis=-1)
                other_l_up = other_l  # feature-res labels; prop_pred resizes
                prop = prop_pred(e2[f], c_emb, other_l_up, max_distance,
                                 self.num_class, feat_valid=fv)
                x = jnp.concatenate([c_emb, prop.astype(c_emb.dtype)],
                                    axis=-1)
                out.append(segblock(x, False))
        return (jnp.mean(jnp.stack(out, 0), axis=0),)


def propnet_loss(outs, batch, deep_sup_scale: float | None = 0.4,
                 allsup_scale: float = 0.3):
    """Training loss (reference: propnet.py:186-237)."""
    labels = batch["labels"]
    t1, b, h, w = labels.shape
    all_label = labels.reshape(t1 * b, h, w)
    label = labels[-1]

    alogp = resize_bilinear(
        jax.nn.log_softmax(outs["pred_s"].astype(jnp.float32), axis=-1),
        (h, w))
    loss_a = nll_from_logprobs(alogp, all_label)
    if deep_sup_scale is not None:
        dlogp = resize_bilinear(
            jax.nn.log_softmax(outs["deepsup"].astype(jnp.float32), axis=-1),
            (h, w))
        loss_a = (loss_a + deep_sup_scale * nll_from_logprobs(dlogp, all_label)
                  ) * allsup_scale

    losses = []
    logp_c = None
    for pred_c in outs["preds_c"]:
        logp_c = resize_bilinear(
            jax.nn.log_softmax(pred_c.astype(jnp.float32), axis=-1), (h, w))
        losses.append(nll_from_logprobs(logp_c, label))
    loss = sum(losses) / len(losses) + loss_a
    acc_label = jnp.where(label == 255, -1, label)
    acc = pixel_acc(logp_c, acc_label)
    return loss, acc
