"""Bidirectional ConvLSTM temporal head (reference: models/BiConvLSTM.py,
Conv_LSTM_Model / Non_local head / SegmentationModule_allclip at
models/models.py:284-467).

TPU-native: the forward and backward recurrences are ``lax.scan``s over the
time axis; the backward pass scans the reversed sequence.  The reference's
``SegmentationModule_allclip`` training branch with ``fix=False`` references
an undefined ``loss1`` and its eval branch an undefined ``preds__``
(models/models.py:441-447, 460-470) — i.e. only the frozen-encoder training
path actually runs; we implement the working semantics (mean per-frame loss)
for both and compute eval predictions from the temporal head.
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


class BiConvLSTMCell(nn.Module):
    hidden_dim: int
    kernel: int = 3
    dtype: Any = None

    def setup(self):
        self.conv = Conv(4 * self.hidden_dim, self.kernel,
                         padding=self.kernel // 2, dtype=self.dtype)
        self.conv_concat = Conv(self.hidden_dim, self.kernel,
                                padding=self.kernel // 2, dtype=self.dtype)

    def __call__(self, x, state):
        h, c = state
        cc = self.conv(jnp.concatenate([x, h], axis=-1))
        i, f, o, g = jnp.split(cc, 4, axis=-1)
        i, f, o, g = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o), jnp.tanh(g)
        c_next = f * c + i * g
        h_next = o * jnp.tanh(c_next)
        return h_next, c_next

    def concat_out(self, h_fwd, h_bwd):
        return self.conv_concat(jnp.concatenate([h_fwd, h_bwd], axis=-1))


class BiConvLSTM(nn.Module):
    """x: [B, T, H, W, C] → [B, T, H, W, hidden] (single layer)."""

    hidden_dim: int
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, t, h, w, _ = x.shape
        cell = BiConvLSTMCell(self.hidden_dim, self.kernel, dtype=self.dtype,
                              name="cell")
        h0 = jnp.zeros((b, h, w, self.hidden_dim), x.dtype)
        c0 = jnp.zeros_like(h0)

        # python loop over the (short) clip — keeps flax param creation
        # simple; T is 2-5 frames in every reference config
        fwd, state = [], (h0, c0)
        for ti in range(t):
            hn, cn = cell(x[:, ti], state)
            state = (hn, cn)
            fwd.append(hn)
        bwd, state = [], (h0, c0)
        for ti in reversed(range(t)):
            hn, cn = cell(x[:, ti], state)
            state = (hn, cn)
            bwd.append(hn)
        bwd = bwd[::-1]
        outs = [cell.concat_out(f_, b_) for f_, b_ in zip(fwd, bwd)]
        return jnp.stack(outs, axis=1)


class ConvLSTMModel(nn.Module):
    """720-ch HRNet features → BiConvLSTM head (models/models.py:284-312)."""

    num_class: int
    emb_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, clip_feats, train: bool = False):
        """clip_feats: [T, B, H, W, 720] → logits [T, B, H, W, K]."""
        t, b = clip_feats.shape[:2]
        flat = clip_feats.reshape(t * b, *clip_feats.shape[2:])
        emb = Conv(self.emb_dim, 3, padding=1, use_bias=False,
                   dtype=self.dtype, name="embed")(flat)
        emb = emb.reshape(t, b, *emb.shape[1:]).transpose(1, 0, 2, 3, 4)
        lstm = BiConvLSTM(self.emb_dim, dtype=self.dtype,
                          name="convlstm")(emb)
        lstm = lstm.transpose(1, 0, 2, 3, 4).reshape(t * b, *lstm.shape[2:])
        out = Conv(self.num_class, 1, dtype=self.dtype, name="last_layer")(lstm)
        return out.reshape(t, b, *out.shape[1:])


class NonLocalClipHead(nn.Module):
    """720-ch features → 3D non-local head (models/models.py:316-341)."""

    num_class: int
    dtype: Any = None

    @nn.compact
    def __call__(self, clip_feats, train: bool = False):
        t, b = clip_feats.shape[:2]
        flat = clip_feats.reshape(t * b, *clip_feats.shape[2:])
        emb = Conv(128, 1, dtype=self.dtype, name="emb")(flat)
        fh, fw = emb.shape[1:3]
        x = emb.reshape(t, b, fh, fw, 128).transpose(1, 0, 2, 3, 4)
        x = NLBlockND(128, mode="dot", dtype=self.dtype,
                      name="nonlocalblock")(x, train)
        x = x.transpose(1, 0, 2, 3, 4).reshape(t * b, fh, fw, 128)
        out = Conv(self.num_class, 1, dtype=self.dtype, name="last_layer")(x)
        return out.reshape(t, b, fh, fw, self.num_class)


class SegmentationModuleAllClip(nn.Module):
    """HRNet encoder (frozen/no-grad) + ConvLSTM or non-local temporal head
    (models/models.py:345-467)."""

    encoder: nn.Module
    num_class: int
    head: str = "convlstm"  # or "non_local"
    dtype: Any = None

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        t, b, h, w, _ = imgs.shape
        flat = imgs.reshape(t * b, h, w, imgs.shape[-1])
        feats = self.encoder(flat, train=False)[0]     # encoder frozen/eval
        feats = jax.lax.stop_gradient(feats)
        feats = feats.reshape(t, b, *feats.shape[1:])
        if self.head == "convlstm":
            return ConvLSTMModel(self.num_class, dtype=self.dtype,
                                 name="prop_clip")(feats, train)
        return NonLocalClipHead(self.num_class, dtype=self.dtype,
                                name="prop_clip")(feats, train)


def allclip_loss(outs, batch, **_):
    """Mean per-frame loss (models/models.py:426-437)."""
    labels = batch["labels"]
    t = labels.shape[0]
    h, w = labels.shape[2:4]
    losses = []
    logp = None
    for f in range(t):
        logp = resize_bilinear(
            jax.nn.log_softmax(outs[f].astype(jnp.float32), axis=-1), (h, w))
        losses.append(nll_from_logprobs(logp, labels[f]))
    acc_label = jnp.where(labels[-1] == 255, -1, labels[-1])
    return sum(losses) / t, pixel_acc(logp, acc_label)
