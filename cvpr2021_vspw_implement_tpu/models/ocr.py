"""OCR (Object-Contextual Representations) decoder + temporal variant.

Re-implements the reference OCR stack (reference: models/ocrnet.py:22-72,
models/ocr_modules/spatial_ocr_block.py:39-380) in flax/NHWC:

  * ``spatial_gather`` — class-probability-weighted region features: softmax
    over pixels per class, then a [K, HW] x [HW, C] matmul (einsum on MXU);
  * ``SpatialTemporalGather`` — per-frame gather then mean across the clip
    (or across a streaming memory of the last ``memory_num`` contexts at
    inference; spatial_ocr_block.py:70-129).  The ``reduce='max'`` variant
    replicates spatial_ocr_block_max.py (mean→max);
  * ``ObjectAttentionBlock2D`` — pixel-query / region-key-value attention;
  * ``SpatialOCR`` — attention context concat + 1x1 fuse;
  * ``SpatialOCRNet`` — conv3x3 on C5, DSN aux head on C4 (the gather's
    probability source), OCR head, classifier.

Region features are [N, K, C] tensors (the reference carries them as
[N, C, K, 1] images); 1x1 convs on them become dense layers with BN over
(N, K) — numerically identical.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .decoders import _bn_bias_init
from .layers import BatchNorm2d, Conv, ConvBNReLU, Dropout2d


def spatial_gather(feats: jnp.ndarray, probs: jnp.ndarray,
                   scale: float = 1.0, valid=None) -> jnp.ndarray:
    """feats [N,H,W,C], probs(logits) [N,H,W,K] → region features [N,K,C].

    ``valid``: runtime (rows, cols) of the TRUE feature map inside a
    width-bucketed zero-padded grid (ops/masked.py) — padded pixels are
    excluded from the softmax (-inf logits), so the gather over the valid
    region equals the unpadded run's."""
    n, h, w, c = feats.shape
    k = probs.shape[-1]
    p = probs.astype(jnp.float32)
    if valid is not None:
        hv, wv = valid
        mh = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) < hv
        mw = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < wv
        p = jnp.where((mh & mw)[None, :, :, None], p, -jnp.inf)
    p = jax.nn.softmax(scale * p.reshape(n, h * w, k),
                       axis=1)                         # over pixels, per class
    f = feats.reshape(n, h * w, c)
    return jnp.einsum("npk,npc->nkc", p, f.astype(jnp.float32)).astype(feats.dtype)


def spatial_temporal_gather(feats: jnp.ndarray, probs: jnp.ndarray,
                            clip_num: int, scale: float = 1.0,
                            reduce: str = "mean") -> jnp.ndarray:
    """Per-frame spatial gather averaged across the clip.

    feats/probs: [(T+1)*B, H, W, C/K] frame-major (reference batch-concat
    order).  Returns [B, K, C].
    """
    tb = feats.shape[0]
    b = tb // (clip_num + 1)
    ctx = spatial_gather(feats, probs, scale)          # [(T+1)B, K, C]
    ctx = ctx.reshape(clip_num + 1, b, *ctx.shape[1:])
    if reduce == "max":
        return jnp.max(ctx, axis=0)
    return jnp.mean(ctx, axis=0)


class _RegionTransform(nn.Module):
    """1x1 conv + BN (+ReLU) applied to region features [N, K, C]."""

    features: int
    depth: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # [N, K, C] → [N, K, 1, C] so BatchNorm2d reduces over (N, K)
        y = x[:, :, None, :]
        for i in range(self.depth):
            y = Conv(self.features, 1, dtype=self.dtype, name=f"conv{i}")(y)
            y = BatchNorm2d(self.features, dtype=self.dtype,
                            bias_init=_bn_bias_init, name=f"bn{i}")(y, train)
            y = nn.relu(y)
        return y[:, :, 0, :]


class ObjectAttentionBlock2D(nn.Module):
    """Pixel-to-region attention (reference: spatial_ocr_block.py:176-291)."""

    in_channels: int
    key_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, proxy, train: bool = False):
        """x [N,H,W,C]; proxy (region feats) [N,K,C] → context [N,H,W,C]."""
        n, h, w, _ = x.shape
        # f_pixel: two 1x1 conv+BN+ReLU on pixels
        q = x
        for i in range(2):
            q = Conv(self.key_channels, 1, dtype=self.dtype,
                     name=f"f_pixel_{i}_conv")(q)
            q = BatchNorm2d(self.key_channels, dtype=self.dtype,
                            bias_init=_bn_bias_init,
                            name=f"f_pixel_{i}_bn")(q, train)
            q = nn.relu(q)
        key = _RegionTransform(self.key_channels, depth=2, dtype=self.dtype,
                               name="f_object")(proxy, train)
        value = _RegionTransform(self.key_channels, depth=1, dtype=self.dtype,
                                 name="f_down")(proxy, train)

        qf = q.reshape(n, h * w, self.key_channels).astype(jnp.float32)
        sim = jnp.einsum("npc,nkc->npk", qf, key.astype(jnp.float32))
        sim = sim * (self.key_channels ** -0.5)
        sim = jax.nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("npk,nkc->npc", sim, value.astype(jnp.float32))
        ctx = ctx.reshape(n, h, w, self.key_channels).astype(x.dtype)
        # f_up: 1x1 conv + BN + ReLU back to in_channels
        ctx = Conv(self.in_channels, 1, dtype=self.dtype, name="f_up_conv")(ctx)
        ctx = BatchNorm2d(self.in_channels, dtype=self.dtype,
                          bias_init=_bn_bias_init, name="f_up_bn")(ctx, train)
        return nn.relu(ctx)


class SpatialOCR(nn.Module):
    """Attention context + 1x1 fuse (reference: spatial_ocr_block.py:310-380)."""

    in_channels: int
    key_channels: int
    out_channels: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, proxy, train: bool = False):
        ctx = ObjectAttentionBlock2D(self.in_channels, self.key_channels,
                                     dtype=self.dtype,
                                     name="object_context_block")(feats, proxy, train)
        x = jnp.concatenate([ctx, feats], axis=-1)
        x = Conv(self.out_channels, 1, dtype=self.dtype, name="fuse_conv")(x)
        x = BatchNorm2d(self.out_channels, dtype=self.dtype,
                        bias_init=_bn_bias_init, name="fuse_bn")(x, train)
        x = nn.relu(x)
        return Dropout2d(self.dropout, name="fuse_drop")(x, train)


class SpatialOCRNet(nn.Module):
    """OCR decoder head (reference: models/ocrnet.py:22-72).

    Returns (logits, dsn_logits) in training, (logits,) at inference.
    """

    num_class: int
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None):
        """``valid_hw``: runtime (rows, cols) valid size of C5 inside a
        width-bucketed zero-padded grid (ops/masked.py).  C4/C5 arrive
        masked (the trunk runs under the conv-boundary mask interceptor);
        the 3x3 convs below therefore stay exact on the valid region, the
        gather excludes padded pixels via ``valid=``, and every remaining
        op (region attention, 1x1 convs) is pixelwise — so the valid
        region of the logits equals the unpadded run bit for bit."""
        c4, c5 = conv_out[-2], conv_out[-1]
        # DSN aux head — also the gather's probability source; the reference's
        # inline Sequential uses a biased conv (ocrnet.py:48-49)
        d = ConvBNReLU(512, use_bias=True, dtype=self.dtype,
                       bn_bias_init=_bn_bias_init,
                       name="dsn_head_cbr")(c4, train)
        d = Dropout2d(0.05, name="dsn_drop")(d, train)
        x_dsn = Conv(self.num_class, 1, dtype=self.dtype, name="dsn_cls")(d)

        x = Conv(512, 3, padding=1, dtype=self.dtype, name="conv_3x3_conv")(c5)
        x = BatchNorm2d(512, dtype=self.dtype, bias_init=_bn_bias_init,
                        name="conv_3x3_bn")(x, train)
        x = nn.relu(x)

        # DSN logits at C4 resolution == C5 resolution (both OS 8)
        context = spatial_gather(x, x_dsn, valid=valid_hw)
        x = SpatialOCR(512, 256, 512, dropout=0.05, dtype=self.dtype,
                       name="spatial_ocr_head")(x, context, train)
        x = Conv(self.num_class, 1, dtype=self.dtype, name="head")(x)
        if train:
            return x, x_dsn
        return (x,)
