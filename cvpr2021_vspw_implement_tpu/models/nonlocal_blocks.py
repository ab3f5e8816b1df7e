"""Non-local attention blocks: generic ND block + 2D decoder head.

Re-implements NLBlockND (reference: models/non_local.py:7-151 — gaussian /
embedded / dot / concatenate pairwise modes, BN-initialized-to-zero residual
branch) and the Non_local2d decoder (models/non_local_models.py:115-151) in
flax.  Positions (T)HW are flattened so the pairwise function is a single
batched matmul on the MXU regardless of dimensionality.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm2d, Conv


class NLBlockND(nn.Module):
    """x: [N, *spatial, C] (any number of spatial dims); returns same shape."""

    in_channels: int
    inter_channels: int | None = None
    mode: str = "embedded"
    bn_layer: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, valid_mask=None):
        """``valid_mask``: [*spatial] bool (True = real position) for
        width-bucketed masked eval — padded positions are excluded from
        the pairwise attention (key side) and from the dot/concatenate
        normalizer (which divides by the TRUE position count), so the
        valid region of the output equals the unpadded run's.  ``x`` must
        arrive zero-masked on the padded region (the residual add returns
        it unchanged there)."""
        assert self.mode in ("gaussian", "embedded", "dot", "concatenate")
        inter = self.inter_channels or max(self.in_channels // 2, 1)
        n = x.shape[0]
        spatial = x.shape[1:-1]
        p = 1
        for s in spatial:
            p *= s
        flat = x.reshape(n, p, self.in_channels)
        vm = None
        if valid_mask is not None:
            vm = valid_mask.reshape(p)                       # [P] bool
            p_true = jnp.sum(vm.astype(jnp.float32))

        def conv1x1(feats, features, name):
            # 1x1 conv over flattened positions == dense on channels
            return nn.Dense(features, dtype=self.dtype, param_dtype=jnp.float32,
                            name=name)(feats)

        g_x = conv1x1(flat, inter, "g")                      # [N, P, inter]

        if self.mode == "gaussian":
            f = jnp.einsum("npc,nqc->npq", flat.astype(jnp.float32),
                           flat.astype(jnp.float32))
        elif self.mode in ("embedded", "dot"):
            theta = conv1x1(flat, inter, "theta").astype(jnp.float32)
            phi = conv1x1(flat, inter, "phi").astype(jnp.float32)
            f = jnp.einsum("npc,nqc->npq", theta, phi)
        else:  # concatenate
            theta = conv1x1(flat, inter, "theta")            # [N, P, inter]
            phi = conv1x1(flat, inter, "phi")                # [N, Q, inter]
            tp = jnp.broadcast_to(theta[:, :, None, :], (n, p, p, inter))
            ph = jnp.broadcast_to(phi[:, None, :, :], (n, p, p, inter))
            cat = jnp.concatenate([tp, ph], axis=-1)
            f = nn.relu(nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                                 name="W_f")(cat))[..., 0].astype(jnp.float32)

        if vm is not None:
            # exclude padded key positions q: -inf before softmax modes,
            # hard zero for the mean-normalized modes (their queries' rows
            # beyond valid stay garbage — the caller's residual region)
            if self.mode in ("gaussian", "embedded"):
                f = jnp.where(vm[None, None, :], f, -jnp.inf)
            else:
                f = jnp.where(vm[None, None, :], f, 0.0)

        if self.mode in ("gaussian", "embedded"):
            f_div = jax.nn.softmax(f, axis=-1)
        else:
            f_div = f / (p if vm is None else p_true)

        y = jnp.einsum("npq,nqc->npc", f_div,
                       g_x.astype(jnp.float32)).astype(x.dtype)
        # W_z: 1x1 conv (+ BN initialised to zero → identity at start)
        w_y = nn.Dense(self.in_channels, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros if not self.bn_layer
                       else nn.initializers.lecun_normal(),
                       name="W_z")(y)
        if self.bn_layer:
            w_y = BatchNorm2d(self.in_channels, dtype=self.dtype,
                              scale_init=nn.initializers.zeros,
                              name="W_z_bn")(w_y.reshape(n, p, 1,
                                                         self.in_channels),
                                             train).reshape(n, p,
                                                            self.in_channels)
        return (w_y.reshape(x.shape) + x)


class NonLocal2d(nn.Module):
    """Non-local 2D decoder head (reference: models/non_local_models.py:115-151)."""

    num_class: int
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, conv_out, train: bool = False, valid_hw=None):
        """``valid_hw``: runtime (rows, cols) valid size of C5 for
        width-bucketed masked eval.  The embedding/classifier convs are
        1x1 (pixelwise); the only cross-pixel op is the non-local
        attention, which excludes padded key positions via
        ``valid_mask`` — so the valid region equals the unpadded run's.
        (``downsample=True`` halves the grid and is not used by any
        reference config; masked eval asserts it off.)"""
        x = conv_out[-1]
        emb = Conv(256, 1, dtype=self.dtype, name="emb")(x)
        h, w = emb.shape[1:3]
        vm = None
        if valid_hw is not None:
            assert not self.downsample
            import jax.lax as _lax
            hv, wv = valid_hw
            # 1x1 conv bias makes padded emb nonzero; re-zero so the
            # NL block's gaussian/value paths see true zeros there
            vm = ((_lax.broadcasted_iota(jnp.int32, (h, w), 0) < hv)
                  & (_lax.broadcasted_iota(jnp.int32, (h, w), 1) < wv))
            emb = jnp.where(vm[None, :, :, None], emb,
                            jnp.zeros((), emb.dtype))
        if self.downsample:
            import jax.lax as lax
            pooled = lax.reduce_window(
                emb, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
            nl = NLBlockND(256, mode="dot", dtype=self.dtype,
                           name="nonlocalblock")(pooled, train)
            from ..ops.interpolate import resize_bilinear
            nl = resize_bilinear(nl, (h, w))
        else:
            nl = NLBlockND(256, mode="dot", dtype=self.dtype,
                           name="nonlocalblock")(emb, train, valid_mask=vm)
        x = jnp.concatenate([emb, nl], axis=-1)
        x = Conv(self.num_class, 1, dtype=self.dtype, name="last_layer")(x)
        return (x,)
