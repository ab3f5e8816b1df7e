"""TDNet (td4_psp): 4-path temporally-distributed segmentation
(reference: models/td4_psp/td4_psp.py, transformer.py, loss.py).

Four sub-ResNet18 encoders each process a different frame of a 4-frame clip;
channel-sliced PSP heads (``PyramidPooling`` with pid), per-path Encoding
(q/k/v via 1x1 convs, context frames subsampled by stride 3), a chained
cross-frame ScaledDotProductAttention (atn_p_j), spatial LayerNorm, FCN
heads, and OHEM cross-entropy.  The rotating schedule ``pos_id = step % 4``
assigns which path owns the target frame (reference: train_clip2.py:93-94).

Streaming inference keeps 3-deep K/V/Q queues (td4_psp.py:191-202,317-330);
here they are a fixed-size functional carry threaded by the caller.

Deviations (documented): the reference's streaming path unpacks
``Encoding(pre=False)``'s (v, q) in swapped order and feeds shape-mismatched
tensors into LayerNorm (td4_psp.py:317-330 would raise at runtime); we
implement the intended semantics.  The reference's spatial LayerNorm bakes
the train-crop size into its affine params; for other eval sizes we resize
the affine maps bilinearly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..ops.pooling import adaptive_avg_pool2d
from ..utils.metrics import pixel_acc
from .layers import BatchNorm2d, Conv, Dropout2d
from .resnet import resnet18


class ConvBN(nn.Module):
    """transformer.ConvBNReLU — despite the name there is NO activation
    (reference: td4_psp/transformer.py:164-186)."""

    features: int
    use_bn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, 1, dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = BatchNorm2d(self.features, dtype=self.dtype, name="bn")(x, train)
        return x


class Encoding(nn.Module):
    """q/k/v projections (reference: transformer.py:9-57).

    ``pre=True``: subsample spatially by stride 3 (MaxPool2d(k=1, s=3) ==
    strided slice), return flattened (k, v, q?) tokens.
    ``pre=False``: return (v image [N,h,w,d_v], q tokens [N,hw,d_k])."""

    d_model: int = 512
    d_k: int = 64
    d_v: int = 512
    dtype: Any = None

    def _wq(self, x, train):
        x = ConvBN(self.d_k, dtype=self.dtype, name="w_qs_0")(x, train)
        return ConvBN(self.d_k, use_bn=False, dtype=self.dtype,
                      name="w_qs_1")(x, train)

    def _wk(self, x, train):
        x = ConvBN(self.d_k, dtype=self.dtype, name="w_ks_0")(x, train)
        return ConvBN(self.d_k, use_bn=False, dtype=self.dtype,
                      name="w_ks_1")(x, train)

    def _wv(self, x, train):
        return ConvBN(self.d_v, use_bn=False, dtype=self.dtype,
                      name="w_vs")(x, train)

    @nn.compact
    def __call__(self, fea, pre: bool = False, start: bool = False,
                 train: bool = False):
        if pre:
            fea = fea[:, ::3, ::3, :]
            n, h, w, _ = fea.shape
            k = self._wk(fea, train).reshape(n, h * w, self.d_k)
            v = self._wv(fea, train).reshape(n, h * w, self.d_v)
            if start:
                return k, v, None
            q = self._wq(fea, train).reshape(n, h * w, self.d_k)
            return k, v, q
        n, h, w, _ = fea.shape
        v = self._wv(fea, train)                       # image layout
        q = self._wq(fea, train).reshape(n, h * w, self.d_k)
        return v, q


class Attention(nn.Module):
    """Scaled dot-product attention + 1x1 fc (reference: transformer.py:71-105)."""

    d_v: int = 512
    d_k: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, k_src, v_src, q_tgt, fea_size=None, train: bool = False,
                 src_valid=None):
        """``src_valid``: [T] bool over source tokens for width-bucketed
        masked eval — padded-grid tokens are excluded from the softmax, so
        valid-query rows equal the unpadded attention exactly."""
        temp = float(self.d_k) ** 0.5
        attn = jnp.einsum("npc,nqc->npq", q_tgt.astype(jnp.float32),
                          k_src.astype(jnp.float32)) / temp
        if src_valid is not None:
            attn = jnp.where(src_valid[None, None, :], attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=2)
        attn = nn.Dropout(0.1, deterministic=not train,
                          name="attn_drop")(attn)
        out = jnp.einsum("npq,nqc->npc", attn, v_src.astype(jnp.float32))
        out = nn.Dense(self.d_v, dtype=self.dtype, param_dtype=jnp.float32,
                       name="fc")(out.astype(q_tgt.dtype))
        out = nn.Dropout(0.1, deterministic=not train, name="out_drop")(out)
        if fea_size is not None:
            n, h, w = fea_size
            return out.reshape(n, h, w, self.d_v)
        return out


class PyramidPoolingSliced(nn.Module):
    """Channel-sliced PSP (reference: td4_psp.py:623-669): full pyramid convs,
    then keep this path's channel slice of the input and of each branch."""

    in_channels: int
    path_num: int  # 2 in the reference (path_num//2)
    pid: int       # 0 or 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, valid=None):
        """``valid``: runtime valid (rows, cols) of a zero-masked padded
        ``x`` — pooling covers the valid region, resizes use runtime
        sizes, and the output stays zero on the padding (ops/masked.py)."""
        n, h, w, c = x.shape
        out_ch = self.in_channels // 4
        feats = []
        for i, scale in enumerate((1, 2, 3, 6)):
            if valid is None:
                p = adaptive_avg_pool2d(x, scale)
            else:
                from ..ops.masked import adaptive_avg_pool2d_rt
                p = adaptive_avg_pool2d_rt(x, scale, valid)
            p = Conv(out_ch, 1, use_bias=False, dtype=self.dtype,
                     name=f"conv{i + 1}_conv")(p)
            p = BatchNorm2d(out_ch, dtype=self.dtype,
                            name=f"conv{i + 1}_bn")(p, train)
            p = nn.relu(p)
            if valid is None:
                feats.append(resize_bilinear(p, (h, w), align_corners=True))
            else:
                from ..ops.masked import resize_bilinear_rt
                feats.append(resize_bilinear_rt(p, (h, w), (scale, scale),
                                                valid, align_corners=True))
        sl = c // self.path_num
        sl4 = c // (self.path_num * 4)
        parts = [x[..., self.pid * sl:(self.pid + 1) * sl]]
        parts += [f[..., self.pid * sl4:(self.pid + 1) * sl4] for f in feats]
        return jnp.concatenate(parts, axis=-1)


class FCNHead(nn.Module):
    num_class: int
    chn_down: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = x.shape[-1] // self.chn_down
        x = Conv(inter, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="conv")(x)
        x = BatchNorm2d(inter, dtype=self.dtype, name="bn")(x, train)
        x = nn.relu(x)
        x = Dropout2d(0.1, name="drop")(x, train)
        return Conv(self.num_class, 1, dtype=self.dtype, name="cls")(x)


class SpatialLayerNorm(nn.Module):
    """nn.LayerNorm([h, w]) over NCHW == normalize each channel's spatial map
    (reference: td4_psp.py:743-751).  Affine maps sized for the train crop
    are bilinearly resized when the eval spatial size differs."""

    shape: tuple  # (h, w) at train time

    @nn.compact
    def __call__(self, x, valid=None):
        scale = self.param("scale", nn.initializers.ones, self.shape)
        bias = self.param("bias", nn.initializers.zeros, self.shape)
        h, w = x.shape[1:3]
        xf = x.astype(jnp.float32)
        if valid is not None:
            # width-bucketed masked eval: statistics over the valid region
            # only, affine maps resized to the RUNTIME size on the padded
            # grid (in_valid is the static train-crop shape)
            from ..ops.masked import mask_valid, resize_bilinear_rt
            hv, wv = valid
            area = jnp.asarray(hv * wv, jnp.float32)
            xm = mask_valid(xf, valid)
            mean = jnp.sum(xm, axis=(1, 2), keepdims=True) / area
            dev = mask_valid(xf - mean, valid)
            var = jnp.sum(dev * dev, axis=(1, 2), keepdims=True) / area
            xhat = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
            scale = resize_bilinear_rt(scale[None, :, :, None], (h, w),
                                       self.shape, valid)[0, :, :, 0]
            bias = resize_bilinear_rt(bias[None, :, :, None], (h, w),
                                      self.shape, valid)[0, :, :, 0]
            return (xhat * scale[None, :, :, None]
                    + bias[None, :, :, None]).astype(x.dtype)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        xhat = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        if (h, w) != tuple(self.shape):
            scale = resize_bilinear(scale[None, :, :, None], (h, w))[0, :, :, 0]
            bias = resize_bilinear(bias[None, :, :, None], (h, w))[0, :, :, 0]
        return (xhat * scale[None, :, :, None] + bias[None, :, :, None]
                ).astype(x.dtype)


def init_td4_state(batch: int, tokens: int, d_k: int = 64, d_v: int = 512):
    """Streaming K/V/Q queues (3-deep) as a functional carry."""
    z = jnp.zeros
    return {"K": z((3, batch, tokens, d_k), jnp.float32),
            "V": z((3, batch, tokens, d_v), jnp.float32),
            "Q": z((3, batch, tokens, d_k), jnp.float32),
            "count": jnp.zeros((), jnp.int32)}


class TD4PSP(nn.Module):
    num_class: int
    cropsize: int = 479
    path_num: int = 4
    dtype: Any = None

    def setup(self):
        self.paths = [resnet18(dilate_scale=8, dtype=self.dtype)
                      for _ in range(4)]
        self.psps = [PyramidPoolingSliced(512, 2, pid, dtype=self.dtype)
                     for pid in (0, 1, 0, 1)]
        self.encs = [Encoding(dtype=self.dtype) for _ in range(4)]
        # atns[p][j]: path p's attention reading source-enc j
        self.atns = [[Attention(dtype=self.dtype) if j != p else None
                      for j in range(4)] for p in range(4)]
        ln_hw = int(self.cropsize / 8) + 1
        self.lns = [SpatialLayerNorm((ln_hw, ln_hw)) for _ in range(4)]
        self.heads = [FCNHead(self.num_class, chn_down=4, dtype=self.dtype)
                      for _ in range(4)]
        self.auxs = [FCNHead(self.num_class, chn_down=4, dtype=self.dtype)
                     for _ in range(4)]

    def __call__(self, imgs, train: bool = False, pos_id: int = 0,
                 state=None, valid_hw=None):
        if self.is_initializing():
            # touch every path so all four heads/attentions/LNs get params
            # (torch creates them eagerly in __init__)
            out = None
            for p in range(4):
                out = self.train_clip(imgs, p, train)
            return out
        if state is not None:
            return self.stream(imgs, pos_id, state, valid_hw=valid_hw)
        return self.train_clip(imgs, pos_id, train)

    def train_clip(self, imgs, pos_id: int, train: bool):
        """imgs: [4, B, H, W, 3] in temporal order (target = last).

        Returns (main, sub, aux) logits for the target frame at feature res.
        pos_id selects which path owns the target (reference: forward_path*).
        """
        p = pos_id
        zs = {}
        c3_target = None
        for i in range(4):  # frame i (0..2 context, 3 target)
            enc_idx = (p + i + 1) % 4 if i < 3 else p
            conv_out = self.paths[enc_idx](imgs[i], train=train)
            z = self.psps[enc_idx](conv_out[-1], train)
            zs[enc_idx] = z
            if i == 3:
                c3_target = conv_out[-2]

        ctx = [(p + 1) % 4, (p + 2) % 4, (p + 3) % 4]  # temporal order
        k0, v0, _ = self.encs[ctx[0]](zs[ctx[0]], pre=True, start=True,
                                      train=train)
        k1, v1, q1 = self.encs[ctx[1]](zs[ctx[1]], pre=True, train=train)
        k2, v2, q2 = self.encs[ctx[2]](zs[ctx[2]], pre=True, train=train)
        v_t, q_t = self.encs[p](zs[p], pre=False, train=train)

        n, fh, fw, _ = v_t.shape
        a1 = self.atns[p][ctx[0]](k0, v0, q1, train=train)
        a2 = self.atns[p][ctx[1]](k1, a1 + v1, q2, train=train)
        atn = self.atns[p][ctx[2]](k2, a2 + v2, q_t, fea_size=(n, fh, fw),
                                   train=train)
        main = self.heads[p](self.lns[p](atn + v_t), train)
        sub = self.heads[p](self.lns[p](v_t), train)
        aux = self.auxs[p](c3_target, train)
        return main, sub, aux

    def stream(self, img, pos_id: int, state, valid_hw=None):
        """Streaming inference: img [B, H, W, 3], carry = K/V/Q queues.

        Returns (logits, new_state).

        ``valid_hw``: runtime true size inside a width-bucketed zero-padded
        ``img`` — trunk under the mask interceptor, sliced PSP/LayerNorm on
        their masked paths, attention softmax excluding padded-grid tokens
        (the K/V/Q queues live on the padded token grid; invalid-token
        entries are garbage that every reader masks out)."""
        p = pos_id
        fv = tok_valid = None
        if valid_hw is not None:
            from flax import linen as fnn
            from ..ops.masked import (ceil_div, feature_valid, mask_valid,
                                      masked_trunk)
            pad_hw = img.shape[1:3]
            with masked_trunk(valid_hw, pad_hw):
                conv_out = self.paths[p](img, train=False)
            c5 = conv_out[-1]
            fv = feature_valid(c5.shape[1], c5.shape[2], valid_hw, pad_hw)
            # trunk outputs are unmasked under the spatial-conv-input
            # interceptor — re-zero before the sliced PSP / token encoders
            c5 = mask_valid(c5, fv)
            z = self.psps[p](c5, False, valid=fv)
            th, tw = -(-c5.shape[1] // 3), -(-c5.shape[2] // 3)
            ti = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
            tj = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
            tok_valid = ((ti < ceil_div(fv[0], 3))
                         & (tj < ceil_div(fv[1], 3))).reshape(th * tw)
        else:
            conv_out = self.paths[p](img, train=False)
            z = self.psps[p](conv_out[-1], False)
        v_cur, q_cur = self.encs[p](z, pre=False, train=False)
        n, fh, fw, _ = v_cur.shape

        ctx = [(p + 1) % 4, (p + 2) % 4, (p + 3) % 4]
        a1 = self.atns[p][ctx[0]](state["K"][0], state["V"][0], state["Q"][1],
                                  src_valid=tok_valid)
        a2 = self.atns[p][ctx[1]](state["K"][1], a1 + state["V"][1],
                                  state["Q"][2], src_valid=tok_valid)
        att = self.atns[p][ctx[2]](state["K"][2], a2 + state["V"][2], q_cur,
                                   fea_size=(n, fh, fw), src_valid=tok_valid)
        warm = state["count"] >= 3
        feat = jnp.where(warm, att + v_cur, v_cur)
        if fv is not None:
            feat = mask_valid(feat, fv)
            out = self.heads[p](self.lns[p](feat, valid=fv), False)
        else:
            out = self.heads[p](self.lns[p](feat), False)

        k_new, v_new, q_new = self.encs[p](z, pre=True, train=False)
        new_state = {
            "K": jnp.roll(state["K"], -1, 0).at[-1].set(k_new.astype(jnp.float32)),
            "V": jnp.roll(state["V"], -1, 0).at[-1].set(v_new.astype(jnp.float32)),
            "Q": jnp.roll(state["Q"], -1, 0).at[-1].set(q_new.astype(jnp.float32)),
            "count": jnp.minimum(state["count"] + 1, 3),
        }
        return out, new_state


def ohem_ce_loss(logits_up: jnp.ndarray, label: jnp.ndarray, n_min: int,
                 thresh: float = 0.7, ignore_index: int = 255) -> jnp.ndarray:
    """OHEM cross-entropy (reference: td4_psp/loss.py:21-44): sort per-pixel
    CE descending; if the n_min-th loss exceeds -log(thresh), average all
    losses above the threshold, else average the top n_min."""
    logp = jax.nn.log_softmax(logits_up.astype(jnp.float32), axis=-1)
    valid = label != ignore_index
    lab = jnp.where(valid, label, 0).astype(jnp.int32)
    # gather-free label pick (see models/segmentation.py::nll_from_logprobs)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logp.shape, logp.ndim - 1)
              == lab[..., None])
    ce = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    ce = jnp.where(valid, ce, 0.0).reshape(-1)
    srt = jnp.sort(ce)[::-1]
    th = -jnp.log(jnp.float32(thresh))
    hard = srt > th
    mean_above = jnp.sum(srt * hard) / jnp.maximum(jnp.sum(hard), 1)
    mean_topk = jnp.mean(srt[:n_min])
    return jnp.where(srt[n_min] > th, mean_above, mean_topk)


def td4_loss(outs, batch, cropsize: int | None = None, **_):
    """main + 0.5*sub + 0.1*aux OHEM losses on the target frame
    (reference: td4_psp.py:572-577); logits upsampled align_corners=True."""
    main, sub, aux = outs
    labels = batch["labels"]
    label = labels[-1]
    b, h, w = label.shape
    n_min = b * h * w // 16
    up = lambda x: resize_bilinear(x.astype(jnp.float32), (h, w),
                                   align_corners=True)
    main_up = up(main)
    loss = (ohem_ce_loss(main_up, label, n_min)
            + 0.5 * ohem_ce_loss(up(sub), label, n_min)
            + 0.1 * ohem_ce_loss(up(aux), label, n_min))
    acc_label = jnp.where(label == 255, -1, label)
    return loss, pixel_acc(main_up, acc_label)
