"""Pallas TPU kernel: fused separable-ConvGRU pass (RAFT refinement loop).

The reference's SepConvGRU (RAFT_core/update.py:33-60) runs six small
Conv2d + three activations + a blend per iteration; chained 19-20 times at
1/8 resolution it is latency-bound on TPU — each conv is ~0.1 ms of MXU
work buried in layout changes and HBM round-trips.  This kernel runs one
whole separable pass (z|r gate conv, q conv on [r*h | x], blend) with the
[h|x] tile resident in VMEM.

Formulation (gather-free, conv-free):
  * a 1x5 conv along W is five shifted matmuls of the row-flattened input:
    out[p] = sum_k  hx[p + k - 2] @ W[k]  over flattened p = t*W + w.  The
    shift is a cheap sublane ``pltpu.roll``; taps that cross a row boundary
    (== the conv's zero padding) are killed by an iota mask AFTER the
    matmul, so the MXU always sees dense [Ht*W, cin] x [cin, cout] tiles;
  * z and r share the [h|x] input, so their kernels are pre-concatenated by
    the caller into one [5, cin, 2*hd] contraction (bit-identical math —
    conv output channels are independent);
  * the q conv reuses the same flattened tile with the h columns replaced
    by r*h — no second materialization of x;
  * the 5x1 vertical pass is the same kernel on the H<->W transposed
    tensors (the transpose is a minor-dim relayout, ~0.1 ms of HBM traffic
    per iteration at RAFT-480p scale).

Gradients: the frozen-flow consumers (NetWarp/ETC/TC — reference freezes
RAFT at load, raft.py:43-45) never differentiate this; RAFT re-training
gets exact gradients through a custom VJP that replays the XLA reference
formulation (``sep_conv_gru_pass_xla``), which this kernel matches
numerically (tests/test_pallas_gru.py: interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target rows per flattened matmul tile: enough M for the MXU, small
# enough that the [Ht*W, cin] tiles + weights fit VMEM comfortably
_TARGET_FLAT_ROWS = 2048


def _gru_pass_kernel(h_ref, x_ref, kzr_ref, bzr_ref, kq_ref, bq_ref,
                     o_ref, hxp_ref, *, w: int, taps: int):
    """One separable GRU pass on a [1, Ht, W, C] tile, conv along W.

    ``hxp_ref``: [Ht*W + taps-1, cin] VMEM scratch holding the flattened
    [h|x] tile at row offset taps//2 — each tap is then a STATIC sublane
    slice (``pltpu.roll`` can't rotate bf16 on this Mosaic).  The scratch
    edge rows are never initialized: a tap only reads them where the
    w-boundary mask discards the term (``jnp.where``, so even NaNs die)."""
    ht = h_ref.shape[1]
    hd = h_ref.shape[3]
    m = ht * w
    r_pad = taps // 2

    cdt = hxp_ref.dtype            # compute dtype (x/weights); h may be f32
    hflat = h_ref[0].reshape(m, hd)
    xflat = x_ref[0].reshape(m, x_ref.shape[3])

    # w-index of every flattened row; tap validity masks kill the terms
    # whose shifted read crossed a row boundary (== conv zero padding)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % w

    def tap_matmul(k_ref, cout):
        acc = jnp.zeros((m, cout), jnp.float32)
        for k in range(taps):
            d = k - r_pad
            term = jax.lax.dot_general(
                hxp_ref[pl.ds(r_pad + d, m), :], k_ref[k],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            valid = ((w_idx + d >= 0) & (w_idx + d < w))
            acc = acc + jnp.where(valid, term, 0.0)
        return acc

    hxp_ref[pl.ds(r_pad, m), :hd] = hflat.astype(cdt)
    hxp_ref[pl.ds(r_pad, m), hd:] = xflat
    zr = jax.nn.sigmoid(tap_matmul(kzr_ref, 2 * hd)
                        + bzr_ref[:].astype(jnp.float32))
    z, r = zr[:, :hd], zr[:, hd:]

    hf32 = hflat.astype(jnp.float32)
    hxp_ref[pl.ds(r_pad, m), :hd] = (r * hf32).astype(cdt)
    q = jnp.tanh(tap_matmul(kq_ref, hd)
                 + bq_ref[:].astype(jnp.float32))

    o_ref[0] = ((1.0 - z) * hf32 + z * q).astype(
        o_ref.dtype).reshape(ht, w, hd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gru_pass_pallas(h, x, kzr, bzr, kq, bq, interpret: bool = False):
    """Horizontal (1xK along W) separable GRU pass.

    h [B,H,W,hd], x [B,H,W,cx]; kzr [K,cin,2hd], kq [K,cin,hd],
    bzr [2hd], bq [hd] with cin = hd+cx.  Returns the new h."""
    b, h_dim, w_dim, hd = h.shape
    taps = kzr.shape[0]

    # sublane alignment of the flattened [Ht*W, cin] tiles (scratch dtype)
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    w_pad = pl.cdiv(w_dim, sub) * sub
    ht = max(1, _TARGET_FLAT_ROWS // w_pad)
    h_pad = pl.cdiv(h_dim, ht) * ht
    if (h_pad, w_pad) != (h_dim, w_dim):
        pads = ((0, 0), (0, h_pad - h_dim), (0, w_pad - w_dim), (0, 0))
        h = jnp.pad(h, pads)
        x = jnp.pad(x, pads)

    cx = x.shape[-1]
    out = pl.pallas_call(
        functools.partial(_gru_pass_kernel, w=w_pad, taps=taps),
        grid=(b, h_pad // ht),
        in_specs=[
            pl.BlockSpec((1, ht, w_pad, hd), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, w_pad, cx), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((taps, hd + cx, 2 * hd),
                         lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * hd), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((taps, hd + cx, hd), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w_pad, hd),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w_pad, hd), h.dtype),
        scratch_shapes=[
            pltpu.VMEM((ht * w_pad + taps - 1, hd + cx), x.dtype)],
        interpret=interpret,
    )(h, x, kzr, bzr.reshape(1, -1), kq, bq.reshape(1, -1))
    return out[:, :h_dim, :w_dim]


def sep_conv_gru_pass_xla(h, x, kzr, bzr, kq, bq, axis: int):
    """XLA reference formulation of one separable GRU pass (the math the
    Pallas kernel reproduces; also the custom-VJP backward)."""
    kh, kw = kzr.shape[:2]
    hd = h.shape[-1]

    def conv(inp, kernel, bias):
        out = jax.lax.conv_general_dilated(
            inp, kernel, window_strides=(1, 1),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias

    hx = jnp.concatenate([h, x], axis=-1)
    zr = jax.nn.sigmoid(conv(hx, kzr, bzr))
    z, r = zr[..., :hd], zr[..., hd:]
    q = jnp.tanh(conv(jnp.concatenate([r * h, x], axis=-1), kq, bq))
    return (1 - z) * h + z * q


def _pass_fwd(h, x, kzr, bzr, kq, bq, axis, interpret):
    return sep_conv_gru_pass(h, x, kzr, bzr, kq, bq, axis=axis,
                             interpret=interpret), (h, x, kzr, bzr, kq, bq)


def _pass_bwd(axis, interpret, res, g):
    h, x, kzr, bzr, kq, bq = res
    _, vjp = jax.vjp(
        lambda *a: sep_conv_gru_pass_xla(*a, axis=axis), h, x, kzr, bzr,
        kq, bq)
    return vjp(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def sep_conv_gru_pass(h, x, kzr, bzr, kq, bq, axis: int,
                      interpret: bool = False):
    """Fused separable GRU pass: ``axis=0`` for the 1xK (along-W) pass,
    ``axis=1`` for the Kx1 (along-H) pass.  Kernels in HWIO with the
    singleton spatial dim kept ([1,K,...] / [K,1,...])."""
    if axis == 0:
        kzr2, kq2 = kzr[0], kq[0]            # [K, cin, cout]
        return _gru_pass_pallas(h, x, kzr2, bzr, kq2, bq,
                                interpret=interpret)
    kzr2, kq2 = kzr[:, 0], kq[:, 0]
    out = _gru_pass_pallas(h.swapaxes(1, 2), x.swapaxes(1, 2),
                           kzr2, bzr, kq2, bq, interpret=interpret)
    return out.swapaxes(1, 2)


sep_conv_gru_pass.defvjp(_pass_fwd, _pass_bwd)
