"""RAFT update block: motion encoder + separable ConvGRU + flow head
(reference: RAFT_core/update.py).

TPU-first restructuring of the hot refinement loop:

* the SepConvGRU declares its six conv weights directly (param tree is
  identical to the torch layout the importers target: ``gru/convz1/kernel``
  etc.) and computes the z and r gates with ONE fused convolution over
  concatenated kernels — the two gates share the same [h|x] input, so this
  halves the gate-conv count with bit-identical math (reference runs them
  as two separate nn.Conv2d, update.py:36-45);
* on TPU the two separable passes run as fused Pallas kernels
  (ops/pallas/gru.py) that keep the [h|x] tile, both gate matmuls and the
  blend in VMEM — the XLA path below is the reference implementation and
  the CPU fallback;
* the convex-upsampling mask head is exposed separately (``mask()``) so the
  driver can hoist it out of the ``lax.scan`` when only the final
  iteration's mask is consumed (reference computes it every iteration,
  update.py:136, and discards all but the last when test_mode).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv, kaiming_normal_fan_out


class FlowHead(nn.Module):
    hidden_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.hidden_dim, 3, padding=1, dtype=self.dtype,
                         kernel_init=kaiming_normal_fan_out, name="conv1")(x))
        return Conv(2, 3, padding=1, dtype=self.dtype,
                    kernel_init=kaiming_normal_fan_out, name="conv2")(x)


class ConvParams(nn.Module):
    """Declares a conv's kernel+bias without applying it — lets the parent
    fuse several convs into one MXU contraction while keeping the param
    tree identical to a plain ``nn.Conv`` (for the torch importers)."""

    kernel_shape: Sequence[int]          # (kh, kw, in, out) HWIO

    @nn.compact
    def __call__(self):
        shape = tuple(self.kernel_shape)
        k = self.param("kernel", kaiming_normal_fan_out, shape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (shape[-1],),
                       jnp.float32)
        return k, b


def _conv2d(x, kernel, bias, pad_h: int, pad_w: int):
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


class SepConvGRU(nn.Module):
    """Two-pass (1x5 then 5x1) gated recurrent unit (update.py:33-60)."""

    hidden_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        cin = h.shape[-1] + x.shape[-1]

        from ...ops.masked import current_mask, feature_valid, mask_valid
        mask_ctx = current_mask()
        fv = None
        if mask_ctx is not None:
            # width-bucketed masked eval: the gate convs are raw lax calls
            # (no flax module boundary for the interceptor), so the carry
            # is re-masked each pass — otherwise padded-position garbage
            # from the (1-z)*h blend leaks into the valid region through
            # the 5-tap windows on the next pass
            fv = feature_valid(h.shape[1], h.shape[2], *mask_ctx)
        use_pallas = (mask_ctx is None
                      and not self.is_initializing()
                      and jax.default_backend() not in ("cpu",)
                      and os.environ.get("VSPW_TPU_PALLAS", "1") == "1")
        if use_pallas:
            from ...ops.pallas.gru import sep_conv_gru_pass

        # compute dtype covers the conv CONTRACTIONS only (like nn.Conv's
        # dtype arg in the reference-shaped formulation); the hidden-state
        # carry keeps its own dtype (f32 under the frozen-flow recipes) so
        # the scan carry type is stable and the blend accumulates in f32
        cdt = self.dtype or x.dtype
        xc = x.astype(cdt)
        if fv is not None:
            # x (motion features + context) is unmasked under the
            # spatial-conv-input interceptor — its padded-position garbage
            # would leak through the 5-tap gate convs just like h's
            xc = mask_valid(xc, fv)
        for axis, (kh, kw) in enumerate([(1, 5), (5, 1)]):
            kshape = (kh, kw, cin, hd)
            kz, bz = ConvParams(kshape, name=f"convz{axis + 1}")()
            kr, br = ConvParams(kshape, name=f"convr{axis + 1}")()
            kq, bq = ConvParams(kshape, name=f"convq{axis + 1}")()
            # fused z|r gate conv: both gates read the same [h|x] input
            kzr = jnp.concatenate([kz, kr], axis=-1).astype(cdt)
            bzr = jnp.concatenate([bz, br]).astype(cdt)
            kq, bq = kq.astype(cdt), bq.astype(cdt)
            if use_pallas:
                h = sep_conv_gru_pass(h, xc, kzr, bzr, kq, bq, axis=axis)
                continue
            if fv is not None:
                h = mask_valid(h, fv)
            hx = jnp.concatenate([h.astype(cdt), xc], axis=-1)
            zr = nn.sigmoid(_conv2d(hx, kzr, bzr, kh // 2, kw // 2))
            z, r = zr[..., :hd], zr[..., hd:]
            q = nn.tanh(_conv2d(
                jnp.concatenate([(r * h).astype(cdt), xc], axis=-1),
                kq, bq, kh // 2, kw // 2))
            h = (1 - z) * h + z * q
        return h if fv is None else mask_valid(h, fv)


class BasicMotionEncoder(nn.Module):
    """corr+flow → 128-d motion features (update.py:80-97)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(256, 1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="convc1")(corr))
        cor = nn.relu(Conv(192, 3, padding=1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="convc2")(cor))
        flo = nn.relu(Conv(128, 7, padding=3, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="convf1")(flow))
        flo = nn.relu(Conv(64, 3, padding=1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="convf2")(flo))
        out = nn.relu(Conv(126, 3, padding=1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    hidden_dim: int = 128
    dtype: Any = None

    def setup(self):
        self.encoder = BasicMotionEncoder(dtype=self.dtype)
        self.gru = SepConvGRU(self.hidden_dim, dtype=self.dtype)
        self.flow_head = FlowHead(256, dtype=self.dtype)
        self.mask_0 = Conv(256, 3, padding=1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out)
        self.mask_2 = Conv(64 * 9, 1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out)

    def mask(self, net):
        """Convex-upsampling mask head — callable outside the scan so the
        driver computes it once from the final net when only the last
        iteration's mask is used (reference recomputes per iter)."""
        return 0.25 * self.mask_2(nn.relu(self.mask_0(net)))

    def __call__(self, net, inp, corr, flow, with_mask: bool = True):
        # the fused kernels hold the whole [H*W, C] tile in VMEM; beyond
        # ~4k positions (e.g. the TC metric's 60x107 full-480p run) fall
        # back to the unfused path, whose GRU kernel tiles rows.  Masked
        # (width-bucketed) eval uses the flax formulations — the fused
        # chains never re-mask between convs, so padded-position bias
        # garbage would leak across the valid boundary
        from ...ops.masked import current_mask
        use_fused = (current_mask() is None
                     and not self.is_initializing()
                     and jax.default_backend() not in ("cpu",)
                     and os.environ.get("VSPW_TPU_PALLAS", "1") == "1"
                     and net.shape[1] * net.shape[2] <= 4096)
        if use_fused:
            # fused per-iteration kernels (ops/pallas/raft_update.py): the
            # motion encoder and GRU+flow-head conv chains each cost
            # ~1.6 ms/iter as separate XLA convs at 1/8-res shapes —
            # latency-bound, ~30x above FLOP time; the kernels keep every
            # activation VMEM-resident.  Params are read straight off the
            # bound submodules, so checkpoints/importers are unaffected.
            from ...ops.pallas.raft_update import (gru_flowhead_fused,
                                                   motion_encoder_fused)
            cdt = self.dtype or jnp.float32
            pe = self.encoder.variables["params"]
            mp = {k: {"kernel": pe[k]["conv"]["kernel"].astype(cdt),
                      "bias": pe[k]["conv"]["bias"].astype(jnp.float32)}
                  for k in ("convc1", "convc2", "convf1", "convf2", "conv")}
            motion = motion_encoder_fused(corr, flow, mp)
            gru_in = jnp.concatenate(
                [inp.astype(jnp.float32), motion], axis=-1)
            pg = self.gru.variables["params"]
            pf = self.flow_head.variables["params"]
            gp = {k: {"kernel": pg[k]["kernel"].astype(cdt),
                      "bias": pg[k]["bias"].astype(jnp.float32)}
                  for k in ("convz1", "convr1", "convq1",
                            "convz2", "convr2", "convq2")}
            gp["fh_conv1"] = {
                "kernel": pf["conv1"]["conv"]["kernel"].astype(cdt),
                "bias": pf["conv1"]["conv"]["bias"].astype(jnp.float32)}
            gp["fh_conv2"] = {
                "kernel": pf["conv2"]["conv"]["kernel"].astype(cdt),
                "bias": pf["conv2"]["conv"]["bias"].astype(jnp.float32)}
            net, delta_flow = gru_flowhead_fused(net, gru_in.astype(cdt),
                                                 gp)
            mask = self.mask(net) if with_mask else None
            return net, mask, delta_flow
        motion = self.encoder(flow, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = self.gru(net, gru_in)
        delta_flow = self.flow_head(net)
        mask = self.mask(net) if with_mask else None
        return net, mask, delta_flow
