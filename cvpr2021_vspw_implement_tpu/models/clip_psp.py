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
the time axis.  The pooled statistics per frame are tiny (≤6x6xC), which is
what makes frame-sharded (sequence-parallel) execution cheap: only these
stats cross chips.

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


class ClipPSP(nn.Module):
    encoder: nn.Module
    num_class: int
    fc_dim: int = 2048
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    psp_weight: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        """imgs: [T+1, B, H, W, 3] with the target frame LAST.

        Returns (main_logits [B, h, w, C], deepsup_logits [(T+1)*B, h, w, C])
        in training; (main_logits,) at inference.
        """
        t1, b, h, w, _ = imgs.shape
        flat = imgs.reshape(t1 * b, h, w, imgs.shape[-1])
        conv_out = self.encoder(flat, train=train)
        c5 = conv_out[-1]                      # [(T+1)B, h8, w8, fc_dim]
        fh, fw, fc = c5.shape[1:]
        c5_t = c5.reshape(t1, b, fh, fw, fc)
        target_c5 = c5_t[-1]

        psp_w = None
        if self.psp_weight:
            wl = Conv(1, 1, use_bias=False, dtype=self.dtype,
                      name="pspweight_conv")(c5)
            wp = global_avg_pool(wl)                     # [(T+1)B,1,1,1]
            # softmax across frames, kept in INPUT order (others..., target)
            psp_w = jax.nn.softmax(
                wp.reshape(t1, b, 1, 1, 1).astype(jnp.float32), axis=0)

        blended = []
        for scale in self.pool_scales:
            p = adaptive_avg_pool2d(c5, scale)           # [(T+1)B, s, s, C]
            p = p.reshape(t1, b, scale, scale, fc)
            # reference appends target first, then the others
            p = jnp.concatenate([p[-1:], p[:-1]], axis=0)
            if psp_w is not None:
                p = p * psp_w.astype(p.dtype)
            blended.append(jnp.mean(p, axis=0))          # [B, s, s, C]

        # PPM_conv (reference: clip_psp.py:23-56): per-scale 1x1 conv + BN +
        # ReLU on the blended stats, upsample, concat with target C5, fuse.
        ppm_out = [target_c5]
        for i, feat in enumerate(blended):
            x = Conv(512, 1, use_bias=False, dtype=self.dtype,
                     name=f"ppm_conv_{i}_conv")(feat)
            x = BatchNorm2d(512, dtype=self.dtype, bias_init=_bn_bias_init,
                            name=f"ppm_conv_{i}_bn")(x, train)
            x = nn.relu(x)
            ppm_out.append(resize_bilinear(x, (fh, fw)))
        x = jnp.concatenate(ppm_out, axis=-1)
        x = Conv(512, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="conv_last_0")(x)
        x = BatchNorm2d(512, dtype=self.dtype, bias_init=_bn_bias_init,
                        name="conv_last_1")(x, train)
        x = nn.relu(x)
        x = Dropout2d(0.1, name="conv_last_drop")(x, train)
        main = Conv(self.num_class, 1, dtype=self.dtype, name="conv_last_cls")(x)

        if not train:
            return (main,)

        # deep supervision over ALL frames' C4 (reference: clip_psp.py:205-215)
        conv4 = conv_out[-2]
        d = Conv(self.fc_dim // 4, 3, padding=1, use_bias=False,
                 dtype=self.dtype, name="deepsup_conv")(conv4)
        d = BatchNorm2d(self.fc_dim // 4, dtype=self.dtype,
                        bias_init=_bn_bias_init, name="deepsup_bn")(d, train)
        d = nn.relu(d)
        d = Dropout2d(0.1, name="deepsup_drop")(d, train)
        d = Conv(self.num_class, 1, dtype=self.dtype, name="deepsup_cls")(d)
        return main, d


def clip_psp_loss(outs, batch, deep_sup_scale: float | None = 0.4):
    """Training loss for ClipPSP (reference: clip_psp.py:196-217).

    batch["labels"]: [T+1, B, H, W] int32, target last, 255 = ignore.
    """
    main, deepsup = outs
    labels = batch["labels"]
    t1, b, h, w = labels.shape
    label = labels[-1]
    # reference order: log_softmax at feature res, THEN bilinear upsample,
    # then NLL (clip_psp.py:199-203, 211-215)
    logp = resize_bilinear(
        jax.nn.log_softmax(main.astype(jnp.float32), axis=-1), (h, w))
    loss = nll_from_logprobs(logp, label)
    if deep_sup_scale is not None:
        all_label = labels.reshape(t1 * b, h, w)
        dlogp = resize_bilinear(
            jax.nn.log_softmax(deepsup.astype(jnp.float32), axis=-1), (h, w))
        loss = loss + deep_sup_scale * nll_from_logprobs(dlogp, all_label)
    acc_label = jnp.where(label == 255, -1, label)
    acc = pixel_acc(logp, acc_label)
    return loss, acc
