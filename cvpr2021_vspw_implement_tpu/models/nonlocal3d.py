"""Non-local 3D (space-time) temporal method
(reference: models/non_local_models.py:9-112).

All clip frames are embedded to 256-d, stacked on a time axis, run through a
spatiotemporal NLBlockND (dot mode), concatenated with the per-frame
embedding and classified; training averages per-frame losses, inference
returns per-frame predictions (the eval driver's ``test_all`` averages
scores over overlapping windows — reference: test_clip2.py:90-195).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..utils.metrics import pixel_acc
from .layers import Conv
from .nonlocal_blocks import NLBlockND
from .segmentation import nll_from_logprobs


class NonLocal3D(nn.Module):
    encoder: nn.Module
    num_class: int
    fc_dim: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, imgs, train: bool = False, valid_hw=None):
        """imgs: [T, B, H, W, 3] (all frames supervised; no target slot).

        Returns logits [T, B, h, w, K].

        ``valid_hw``: runtime (rows, cols) of the TRUE frames inside
        width-bucketed zero-padded ``imgs`` (eval only) — masked trunk;
        the space-TIME attention excludes padded key positions on every
        frame (NLBlockND ``valid_mask``), so the valid region is exact."""
        t, b, h, w, _ = imgs.shape
        flat = imgs.reshape(t * b, h, w, imgs.shape[-1])
        vm3 = None
        if valid_hw is not None:
            from ..ops.masked import (feature_valid, mask_valid,
                                      masked_trunk)
            with masked_trunk(valid_hw, (h, w)):
                conv_out = self.encoder(flat, train=train)
                emb = Conv(256, 1, dtype=self.dtype,
                           name="emb")(conv_out[-1])
            fh, fw = emb.shape[1:3]
            fhv, fwv = feature_valid(fh, fw, valid_hw, (h, w))
            emb = mask_valid(emb, (fhv, fwv))
            mh = jax.lax.broadcasted_iota(jnp.int32, (fh, fw), 0) < fhv
            mw = jax.lax.broadcasted_iota(jnp.int32, (fh, fw), 1) < fwv
            vm3 = jnp.broadcast_to((mh & mw)[None], (t, fh, fw))
        else:
            conv_out = self.encoder(flat, train=train)
            emb = Conv(256, 1, dtype=self.dtype, name="emb")(conv_out[-1])
            fh, fw = emb.shape[1:3]
        # [B, T, h, w, C] — time as a spatial dim for the ND block
        x = emb.reshape(t, b, fh, fw, 256).transpose(1, 0, 2, 3, 4)
        x = NLBlockND(256, mode="dot", dtype=self.dtype,
                      name="nonlocalblock")(x, train, valid_mask=vm3)
        x = x.transpose(1, 0, 2, 3, 4).reshape(t * b, fh, fw, 256)
        x = jnp.concatenate([emb, x], axis=-1)
        x = Conv(self.num_class, 1, dtype=self.dtype, name="last_layer")(x)
        return x.reshape(t, b, fh, fw, self.num_class)


def nonlocal3d_loss(outs, batch, **_):
    """Mean of per-frame losses/accs (reference: non_local_models.py:50-62)."""
    preds = outs  # [T, B, h, w, K]
    labels = batch["labels"]
    t = labels.shape[0]
    h, w = labels.shape[2:4]
    losses, accs = [], []
    for f in range(t):
        logp = resize_bilinear(
            jax.nn.log_softmax(preds[f].astype(jnp.float32), axis=-1), (h, w))
        losses.append(nll_from_logprobs(logp, labels[f]))
        acc_label = jnp.where(labels[f] == 255, -1, labels[f])
        accs.append(pixel_acc(logp, acc_label))
    return sum(losses) / t, sum(accs) / t
