"""Pallas TPU kernels: fused RAFT update iteration.

The refinement loop's per-iteration cost on v5e was measured at ~6.8 ms,
split almost evenly between the corr lookup (1.9, already a Pallas
kernel), the motion encoder (1.6), the SepConvGRU (1.6) and the flow
head (1.6) — each a chain of small convs at [B, H/8, W/8, C] that XLA
runs ~20-50x above their FLOP time (layout + HBM round-trips dominate at
60x60 spatial).  These two kernels run the whole iteration's conv work
with every activation VMEM-resident:

  * ``motion_encoder_fused`` — convc1 (1x1) → convc2 (3x3) ∥ convf1
    (7x7 on 2 flow channels, computed as 98 outer-product accumulations
    on the VPU — K=2 matmuls would waste the MXU) → convf2 (3x3) →
    conv (3x3 on the concat) → concat with flow
    (reference: RAFT_core/update.py:80-97);
  * ``gru_flowhead_fused`` — both separable GRU passes (z|r fused gate
    contraction, q on [r*h | x]) AND the 2-conv flow head
    (reference: update.py:33-60, 8-14).

Formulation: all convs are tap-shifted matmuls over the row-flattened
[H*W, C] tile held in ONE padded VMEM scratch; a tap (dy, dx) is the
static sublane slice at offset dy*W + dx, and taps that cross the
H/W boundary (== the conv's zero padding) are killed by iota masks
AFTER the matmul (``jnp.where``, so even uninitialized scratch edges
die).  The 5x1 vertical GRU pass needs no transpose here — a dy shift
is just a W-row flat shift.

Gradients: the frozen-flow consumers (NetWarp/ETC/TC) never
differentiate these; RAFT re-training gets exact gradients through
custom VJPs that replay the XLA reference formulation
(models/raft/update.py), which the kernels match numerically
(tests/test_pallas_raft_update.py: interpret mode on CPU, compiled TPU
via bench.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flat_idx(m: int, w: int):
    i = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    return i // w, i % w


def _tap_conv(scratch_ref, k_ref, cin: int, cout: int, m: int, w: int,
              h: int, pad: int, ksize: int, h_idx, w_idx):
    """ksize x ksize conv of the [m, cin] tile staged in ``scratch_ref``
    rows [pad, pad+m) → [m, cout] f32 accumulator."""
    r = ksize // 2
    acc = jnp.zeros((m, cout), jnp.float32)
    t = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            d = dy * w + dx
            term = jax.lax.dot_general(
                scratch_ref[pl.ds(pad + d, m), :cin], k_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            valid = ((w_idx + dx >= 0) & (w_idx + dx < w)
                     & (h_idx + dy >= 0) & (h_idx + dy < h))
            acc = acc + jnp.where(valid, term, 0.0)
            t += 1
    return acc


def _motion_kernel(corr_ref, flow_ref, wc1_ref, bc1_ref, wc2_ref, bc2_ref,
                   wf1_ref, bf1_ref, wf2_ref, bf2_ref, wm_ref, bm_ref,
                   o_ref, scratch_ref, *, h: int, w: int):
    m = h * w
    pad = 3 * w + 3            # covers the 7x7 taps
    cdt = scratch_ref.dtype
    h_idx, w_idx = _flat_idx(m, w)

    corr = corr_ref[0].reshape(m, corr_ref.shape[3])
    flow = flow_ref[0].reshape(m, 2).astype(jnp.float32)

    # convc1: 1x1 — plain matmul
    cor = jax.nn.relu(jax.lax.dot_general(
        corr.astype(cdt), wc1_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bc1_ref[:])

    # convc2: 3x3 256→192
    scratch_ref[pl.ds(pad, m), :256] = cor.astype(cdt)
    cor2 = jax.nn.relu(
        _tap_conv(scratch_ref, wc2_ref, 256, 192, m, w, h, pad, 3,
                  h_idx, w_idx) + bc2_ref[:])

    # convf1: 7x7 on the 2 flow channels — 49 taps x 2 channels of
    # outer-product accumulation on the VPU (wf1_ref: [98, 128]); tap
    # shifts are static sublane slices of the staged scratch (rolls of
    # [m, 1] vectors explode the Mosaic compile)
    scratch_ref[pl.ds(pad, m), :2] = flow.astype(cdt)
    flo = jnp.zeros((m, 128), jnp.float32)
    t = 0
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            d = dy * w + dx
            valid = ((w_idx + dx >= 0) & (w_idx + dx < w)
                     & (h_idx + dy >= 0) & (h_idx + dy < h))
            uv = scratch_ref[pl.ds(pad + d, m), :2].astype(jnp.float32)
            row_u = wf1_ref[2 * t:2 * t + 1, :].astype(jnp.float32)
            row_v = wf1_ref[2 * t + 1:2 * t + 2, :].astype(jnp.float32)
            contrib = uv[:, 0:1] * row_u + uv[:, 1:2] * row_v
            flo = flo + jnp.where(valid, contrib, 0.0)
            t += 1
    flo = jax.nn.relu(flo + bf1_ref[:])

    # convf2: 3x3 128→64
    scratch_ref[pl.ds(pad, m), :128] = flo.astype(cdt)
    flo2 = jax.nn.relu(
        _tap_conv(scratch_ref, wf2_ref, 128, 64, m, w, h, pad, 3,
                  h_idx, w_idx) + bf2_ref[:])

    # conv: 3x3 on cat(cor2[192], flo2[64]) → 126
    scratch_ref[pl.ds(pad, m), :192] = cor2.astype(cdt)
    scratch_ref[pl.ds(pad, m), 192:256] = flo2.astype(cdt)
    mot = jax.nn.relu(
        _tap_conv(scratch_ref, wm_ref, 256, 126, m, w, h, pad, 3,
                  h_idx, w_idx) + bm_ref[:])

    out = jnp.concatenate([mot, flow], axis=-1)      # [m, 128]
    o_ref[0] = out.astype(o_ref.dtype).reshape(h, w, 128)


def _gru_flowhead_kernel(net_ref, x_ref, kzr1_ref, bzr1_ref, kq1_ref,
                         bq1_ref, kzr2_ref, bzr2_ref, kq2_ref, bq2_ref,
                         wfh1_ref, bfh1_ref, wfh2_ref, bfh2_ref,
                         net_o_ref, delta_o_ref, scratch_ref,
                         *, h: int, w: int):
    m = h * w
    pad = 2 * w + 2            # covers 1x5, 5x1 and 3x3 taps
    cdt = scratch_ref.dtype
    hd = net_ref.shape[3]
    h_idx, w_idx = _flat_idx(m, w)

    net = net_ref[0].reshape(m, hd).astype(jnp.float32)
    x = x_ref[0].reshape(m, x_ref.shape[3])

    def gru_pass(hcur, kzr_ref, bzr_ref, kq_ref, bq_ref, taps):
        """One separable pass; ``taps`` = [(dy, dx), ...]."""
        def tapmm(k_ref, cout):
            acc = jnp.zeros((m, cout), jnp.float32)
            for t, (dy, dx) in enumerate(taps):
                d = dy * w + dx
                term = jax.lax.dot_general(
                    scratch_ref[pl.ds(pad + d, m), :hd + x.shape[1]],
                    k_ref[t],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                valid = ((w_idx + dx >= 0) & (w_idx + dx < w)
                         & (h_idx + dy >= 0) & (h_idx + dy < h))
                acc = acc + jnp.where(valid, term, 0.0)
            return acc

        scratch_ref[pl.ds(pad, m), :hd] = hcur.astype(cdt)
        scratch_ref[pl.ds(pad, m), hd:hd + x.shape[1]] = x
        zr = jax.nn.sigmoid(tapmm(kzr_ref, 2 * hd) + bzr_ref[:])
        z, r = zr[:, :hd], zr[:, hd:]
        scratch_ref[pl.ds(pad, m), :hd] = (r * hcur).astype(cdt)
        q = jnp.tanh(tapmm(kq_ref, hd) + bq_ref[:])
        return (1.0 - z) * hcur + z * q

    taps_h = [(0, dx) for dx in range(-2, 3)]
    taps_v = [(dy, 0) for dy in range(-2, 3)]
    net = gru_pass(net, kzr1_ref, bzr1_ref, kq1_ref, bq1_ref, taps_h)
    net = gru_pass(net, kzr2_ref, bzr2_ref, kq2_ref, bq2_ref, taps_v)

    # flow head: 3x3 128→256 relu, 3x3 256→2
    scratch_ref[pl.ds(pad, m), :hd] = net.astype(cdt)
    fh1 = jax.nn.relu(
        _tap_conv(scratch_ref, wfh1_ref, hd, 256, m, w, h, pad, 3,
                  h_idx, w_idx) + bfh1_ref[:])
    scratch_ref[pl.ds(pad, m), :256] = fh1.astype(cdt)
    delta = _tap_conv(scratch_ref, wfh2_ref, 256, 8, m, w, h, pad, 3,
                      h_idx, w_idx) + bfh2_ref[:]

    net_o_ref[0] = net.astype(net_o_ref.dtype).reshape(h, w, hd)
    delta_o_ref[0] = delta[:, :2].astype(delta_o_ref.dtype).reshape(h, w, 2)


def _full_specs(shapes, dtype_map=None):
    return [pl.BlockSpec(s, lambda bi: tuple([0] * len(s)),
                         memory_space=pltpu.VMEM) for s in shapes]


def _r3(k):
    """[kh, kw, cin, cout] → [kh*kw, cin, cout] tap-major."""
    kh, kw, cin, cout = k.shape
    return k.reshape(kh * kw, cin, cout)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _motion_pallas(corr, flow, p, interpret=False):
    b, h, w, ck = corr.shape
    cdt = p["convc1"]["kernel"].dtype
    m = h * w
    pad = 3 * w + 3

    def spec(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda bi: (0,) * n,
                            memory_space=pltpu.VMEM)

    args = [
        corr.astype(cdt),   # conv input dtype — halves the largest buffer
        flow,
        _r3(p["convc1"]["kernel"]), p["convc1"]["bias"].reshape(1, -1),
        _r3(p["convc2"]["kernel"]), p["convc2"]["bias"].reshape(1, -1),
        # 7x7x2x128 → [98, 128] rows ordered (tap, channel)
        p["convf1"]["kernel"].reshape(49 * 2, 128),
        p["convf1"]["bias"].reshape(1, -1),
        _r3(p["convf2"]["kernel"]), p["convf2"]["bias"].reshape(1, -1),
        _r3(p["conv"]["kernel"]), p["conv"]["bias"].reshape(1, -1),
    ]
    in_specs = [
        pl.BlockSpec((1, h, w, ck), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, w, 2), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [spec(a.shape) for a in args[2:]]

    return pl.pallas_call(
        functools.partial(_motion_kernel, h=h, w=w),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, 128), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m + 2 * pad, 256), cdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gru_flowhead_pallas(net, x, p, interpret=False):
    b, h, w, hd = net.shape
    cdt = x.dtype
    m = h * w
    pad = 2 * w + 2

    def cat_zr(i):
        kz = p[f"convz{i}"]["kernel"]
        kr = p[f"convr{i}"]["kernel"]
        k = jnp.concatenate([kz, kr], axis=-1)
        bias = jnp.concatenate([p[f"convz{i}"]["bias"],
                                p[f"convr{i}"]["bias"]])
        return _r3(k).astype(cdt), bias.reshape(1, -1)

    kzr1, bzr1 = cat_zr(1)
    kzr2, bzr2 = cat_zr(2)
    kq1 = _r3(p["convq1"]["kernel"]).astype(cdt)
    kq2 = _r3(p["convq2"]["kernel"]).astype(cdt)
    # flow-head conv2's 2 output channels padded to 8 lanes (delta[, :2])
    wfh2 = p["fh_conv2"]["kernel"]
    wfh2 = jnp.pad(wfh2, ((0, 0), (0, 0), (0, 0), (0, 8 - wfh2.shape[-1])))
    bfh2 = jnp.pad(p["fh_conv2"]["bias"], (0, 8 - 2))

    def spec(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda bi: (0,) * n,
                            memory_space=pltpu.VMEM)

    args = [
        net, x,
        kzr1, bzr1, kq1, p["convq1"]["bias"].reshape(1, -1),
        kzr2, bzr2, kq2, p["convq2"]["bias"].reshape(1, -1),
        _r3(p["fh_conv1"]["kernel"]).astype(cdt),
        p["fh_conv1"]["bias"].reshape(1, -1),
        _r3(wfh2).astype(cdt), bfh2.reshape(1, -1),
    ]
    in_specs = [
        pl.BlockSpec((1, h, w, hd), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, w, x.shape[-1]), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [spec(a.shape) for a in args[2:]]

    return pl.pallas_call(
        functools.partial(_gru_flowhead_kernel, h=h, w=w),
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, h, w, hd), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, 2), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, hd), net.dtype),
            jax.ShapeDtypeStruct((b, h, w, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m + 2 * pad, max(hd + x.shape[-1], 256)), cdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# XLA reference formulations (forward for tests, backward for the VJPs)
# ---------------------------------------------------------------------------
def _conv2d(x, kernel, bias, pad_h, pad_w):
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


def motion_encoder_xla(corr, flow, p):
    cdt = p["convc1"]["kernel"].dtype

    def c(x, name, padh, padw):
        return _conv2d(x.astype(cdt), p[name]["kernel"], p[name]["bias"],
                       padh, padw)

    cor = jax.nn.relu(c(corr, "convc1", 0, 0))
    cor = jax.nn.relu(c(cor, "convc2", 1, 1))
    flo = jax.nn.relu(c(flow, "convf1", 3, 3))
    flo = jax.nn.relu(c(flo, "convf2", 1, 1))
    out = jax.nn.relu(c(jnp.concatenate([cor, flo], -1), "conv", 1, 1))
    return jnp.concatenate([out.astype(jnp.float32),
                            flow.astype(jnp.float32)], -1)


def gru_flowhead_xla(net, x, p):
    from .gru import sep_conv_gru_pass_xla

    def zr(i):
        return (jnp.concatenate([p[f"convz{i}"]["kernel"],
                                 p[f"convr{i}"]["kernel"]], -1),
                jnp.concatenate([p[f"convz{i}"]["bias"],
                                 p[f"convr{i}"]["bias"]]))

    cdt = x.dtype
    kzr1, bzr1 = zr(1)
    kzr2, bzr2 = zr(2)
    net = sep_conv_gru_pass_xla(net, x, kzr1.astype(cdt), bzr1.astype(cdt),
                                p["convq1"]["kernel"].astype(cdt),
                                p["convq1"]["bias"].astype(cdt), axis=0)
    net = sep_conv_gru_pass_xla(net, x, kzr2.astype(cdt), bzr2.astype(cdt),
                                p["convq2"]["kernel"].astype(cdt),
                                p["convq2"]["bias"].astype(cdt), axis=1)
    fh = jax.nn.relu(_conv2d(net.astype(cdt), p["fh_conv1"]["kernel"],
                             p["fh_conv1"]["bias"], 1, 1))
    delta = _conv2d(fh, p["fh_conv2"]["kernel"], p["fh_conv2"]["bias"],
                    1, 1)
    return net, delta.astype(jnp.float32)


# ---------------------------------------------------------------------------
# public entry points with exact custom VJPs
# ---------------------------------------------------------------------------
def _mot_fwd(corr, flow, p, interpret):
    return motion_encoder_fused(corr, flow, p, interpret), (corr, flow, p)


def _mot_bwd(interpret, res, g):
    corr, flow, p = res
    _, vjp = jax.vjp(lambda c, f, pp: motion_encoder_xla(c, f, pp),
                     corr, flow, p)
    return vjp(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def motion_encoder_fused(corr, flow, p, interpret: bool = False):
    """Fused BasicMotionEncoder: corr [B,H,W,324], flow [B,H,W,2], params
    dict {convc1, convc2, convf1, convf2, conv} → [B,H,W,128] f32."""
    return _motion_pallas(corr, flow, p, interpret=interpret)


motion_encoder_fused.defvjp(_mot_fwd, _mot_bwd)


def _gf_fwd(net, x, p, interpret):
    return gru_flowhead_fused(net, x, p, interpret), (net, x, p)


def _gf_bwd(interpret, res, g):
    net, x, p = res
    _, vjp = jax.vjp(lambda n, xx, pp: gru_flowhead_xla(n, xx, pp),
                     net, x, p)
    return vjp(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_flowhead_fused(net, x, p, interpret: bool = False):
    """Fused SepConvGRU (both passes) + FlowHead: net [B,H,W,128] (carry
    dtype), x [B,H,W,256] (compute dtype), params dict
    {convz1,convr1,convq1,convz2,convr2,convq2,fh_conv1,fh_conv2} →
    (net', delta_flow f32)."""
    return _gru_flowhead_pallas(net, x, p, interpret=interpret)


gru_flowhead_fused.defvjp(_gf_fwd, _gf_bwd)
