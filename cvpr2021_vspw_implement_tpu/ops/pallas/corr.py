"""Pallas TPU kernel: RAFT windowed correlation-pyramid lookup.

The TPU-native equivalent of the reference's only custom native kernel
(RAFT/alt_cuda_corr/correlation_kernel.cu:1-323, consumed at
RAFT_core/corr.py:28-60): for every query pixel p, bilinearly sample a
(2r+1)^2 window around its current correspondence from each pyramid level.

Kernel design (one grid cell per (batch, query-pixel tile)):
  * gathers are eliminated entirely.  Bilinear sampling at y is a 2-tap
    one-hot row vector over H built from an iota comparison; since the
    window offsets are integers, all (2r+1) vertical taps share the same
    fractional weight ``ly`` and differ only in the integer base row.  The
    level plane [TILE_P, H, W] lives in VMEM; the y-contraction is a
    mask-multiply-reduce on the VPU, the x-contraction likewise — dense
    vector math instead of the XLA path's [B, P, 4*(2r+1)^2] flat gathers;
  * zero padding needs no special-casing: an out-of-range tap row/col never
    matches the iota, so its one-hot weight row is all-zero (the reference
    zeros OOB taps via the sampler's padding_mode, utils.py:58-73);
  * channel order matches the reference quirk exactly (outer tap = x,
    inner tap = y — see models/raft/corr.py:_lookup_level).

``lookup_corr_pyramid_fused`` == models.raft.corr.lookup_corr_pyramid
(verified in tests/test_pallas_corr.py: interpret mode on CPU, compiled on
TPU).  Measured on TPU v5e at RAFT-480p scale (60x107 features, 4 levels,
r=4, 20 chained lookups): 7.7 ms/lookup vs 90.3 ms for the XLA
take_along_axis path — 11.7x.  The backward pass reuses the XLA path's VJP
via jax.custom_vjp — the
lookup is inside RAFT's 20-iteration GRU loop, so the frozen-flow methods
(NetWarp/ETC/TC) never differentiate it, and RAFT re-training gets exact
gradients from the reference formulation.

STATUS (round 3): no longer the TPU default.  This kernel's mask-multiply-
reduce runs on the VPU and re-traverses each query's full level plane per
tap row — measured 5.6 ms of the 6.1 ms refinement iteration at the
netwarp shape (b=2, 60x60), ~60x above the HBM floor; merging all levels
into one pallas_call with a bigger query tile (``_lookup_pyramid_pallas``)
did NOT help (6.3 ms — the cost is compute formulation, not grid
overhead).  The same one-hot idea expressed as two batched MXU matmuls in
plain XLA (models/raft/corr.py::lookup_corr_pyramid_onehot) measures
2.3 ms/lookup and is what raft.py now selects on TPU; this kernel stays
available via VSPW_LOOKUP=pallas and as the Mosaic reference for the
formulation (tools/raft_iter_micro.py has the full matrix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 64
TILE_P_PYR = 128


def _corr_lookup_pyr_kernel(coords_ref, *rest, r: int, hws, tp: int):
    """All pyramid levels in ONE kernel invocation.

    The per-level formulation (``_corr_lookup_kernel`` below) is exact but
    pays the pallas_call + grid-step overhead 4x per lookup with a 64-query
    tile — measured 5.6 ms of the 6.1 ms RAFT refinement iteration on v5e
    (tools/raft_iter_micro.py), ~60x above the HBM-traffic floor.  Merging
    the levels into one call with a ``TILE_P_PYR``-query tile cuts the
    sequential grid steps ~8x; each level's [tp, k*k] block is assembled in
    VMEM and stored with one lane-contiguous write instead of k*k
    single-lane column stores.

    rest: nl level refs [1, tp, Hl, Wl] + the output ref [1, tp, nl*k*k].
    """
    nl = len(hws)
    corr_refs = rest[:nl]
    o_ref = rest[nl]
    k = 2 * r + 1
    cx0 = coords_ref[0, :, 0:1].astype(jnp.float32)   # [tp, 1]
    cy0 = coords_ref[0, :, 1:2].astype(jnp.float32)

    def one_hot2(iota, base, lam):
        return (iota == base) * (1.0 - lam) + (iota == base + 1) * lam

    for i, (h, w) in enumerate(hws):
        corr = corr_refs[i][0].astype(jnp.float32)    # [tp, h, w]
        scale = 1.0 / (2.0 ** i)
        cx = cx0 * scale
        cy = cy0 * scale
        x0f = jnp.floor(cx)
        y0f = jnp.floor(cy)
        lx = cx - x0f
        ly = cy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (tp, h), 1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (tp, w), 1)
        wxs = [one_hot2(iota_w, x0 + (tx - r), lx) for tx in range(k)]
        # channel (tx, ty): outer tap = x, inner tap = y (reference quirk)
        cols = [None] * (k * k)
        for ty in range(k):
            wy = one_hot2(iota_h, y0 + (ty - r), ly)          # [tp, h]
            tmp = jnp.sum(wy[:, :, None] * corr, axis=1)      # [tp, w]
            for tx in range(k):
                cols[tx * k + ty] = jnp.sum(tmp * wxs[tx], axis=1,
                                            keepdims=True)
        lvl = jnp.concatenate(cols, axis=1)                   # [tp, k*k]
        o_ref[0, :, i * k * k:(i + 1) * k * k] = lvl.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def _lookup_pyramid_pallas(pyramid, coords, r: int, interpret: bool = False):
    """pyramid: list of [B, P, Hl, Wl]; coords [B, P, 2] (x, y) in LEVEL-0
    pixel units → [B, P, nl*(2r+1)^2], reference channel order."""
    b, p, h0, w0 = pyramid[0].shape
    nl = len(pyramid)
    k = 2 * r + 1
    tp = TILE_P_PYR
    p_pad = pl.cdiv(p, tp) * tp
    if p_pad != p:
        pyramid = [jnp.pad(c, ((0, 0), (0, p_pad - p), (0, 0), (0, 0)))
                   for c in pyramid]
        coords = jnp.pad(coords, ((0, 0), (0, p_pad - p), (0, 0)))

    hws = tuple((c.shape[2], c.shape[3]) for c in pyramid)
    in_specs = [pl.BlockSpec((1, tp, 2), lambda bi, pi: (bi, pi, 0),
                             memory_space=pltpu.VMEM)]
    for (h, w) in hws:
        in_specs.append(
            pl.BlockSpec((1, tp, h, w),
                         (lambda bi, pi: (bi, pi, 0, 0)),
                         memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_corr_lookup_pyr_kernel, r=r, hws=hws, tp=tp),
        grid=(b, p_pad // tp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tp, nl * k * k),
                               lambda bi, pi: (bi, pi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, nl * k * k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(coords, *pyramid)
    return out[:, :p]


def _corr_lookup_kernel(coords_ref, corr_ref, o_ref, *, r: int, h: int,
                        w: int):
    # Mosaic-friendly shapes throughout: per-query scalars live as [TP, 1]
    # column vectors, weights as [TP, dim] planes, output columns as
    # [TP, 1] concatenated along lanes — no 1-D vectors, no late reshapes.
    k = 2 * r + 1
    corr = corr_ref[0].astype(jnp.float32)          # [TP, H, W]
    cx = coords_ref[0, :, 0:1].astype(jnp.float32)  # [TP, 1]
    cy = coords_ref[0, :, 1:2].astype(jnp.float32)  # [TP, 1]

    x0f = jnp.floor(cx)
    y0f = jnp.floor(cy)
    lx = cx - x0f                                   # shared by all x taps
    ly = cy - y0f                                   # shared by all y taps
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, h), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (TILE_P, w), 1)

    def one_hot2(iota, base, lam):
        """2-tap bilinear one-hot row: (1-lam) at base, lam at base+1;
        out-of-range taps simply never match → zero weight (zero pad)."""
        return (iota == base) * (1.0 - lam) + (iota == base + 1) * lam

    # x one-hots are reused across every y tap
    wxs = [one_hot2(iota_w, x0 + (tx - r), lx) for tx in range(k)]

    # channel (tx, ty): outer tap = x, inner tap = y (reference quirk).
    # Each column is stored straight to the output ref so Mosaic never has
    # to keep the 81 temporaries alive at once (VMEM budget).
    for ty in range(k):
        wy = one_hot2(iota_h, y0 + (ty - r), ly)    # [TP, H]
        tmp = jnp.sum(wy[:, :, None] * corr, axis=1)  # [TP, W]
        for tx in range(k):
            col = jnp.sum(tmp * wxs[tx], axis=1, keepdims=True)
            c = tx * k + ty
            o_ref[0, :, c:c + 1] = col.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def _lookup_level_pallas(corr: jnp.ndarray, coords: jnp.ndarray, r: int,
                         interpret: bool = False) -> jnp.ndarray:
    """corr [B, P, Hl, Wl]; coords [B, P, 2] (x, y) in level pixel units
    → [B, P, (2r+1)^2]."""
    b, p, h, w = corr.shape
    k = 2 * r + 1
    p_pad = pl.cdiv(p, TILE_P) * TILE_P
    if p_pad != p:
        corr = jnp.pad(corr, ((0, 0), (0, p_pad - p), (0, 0), (0, 0)))
        coords = jnp.pad(coords, ((0, 0), (0, p_pad - p), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_corr_lookup_kernel, r=r, h=h, w=w),
        grid=(b, p_pad // TILE_P),
        in_specs=[
            pl.BlockSpec((1, TILE_P, 2), lambda bi, pi: (bi, pi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_P, h, w), lambda bi, pi: (bi, pi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_P, k * k),
                               lambda bi, pi: (bi, pi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, k * k), jnp.float32),
        interpret=interpret,
    )(coords, corr)
    return out[:, :p]


def _lookup_fused_fwd(pyramid, coords, radius, interpret):
    return lookup_corr_pyramid_fused(pyramid, coords, radius, interpret), \
        (pyramid, coords)


def _lookup_fused_bwd(radius, interpret, res, g):
    # exact gradients via the XLA reference formulation's VJP (the fused
    # kernel is numerically identical to it); deferred import avoids a
    # module cycle with models.raft.corr
    from ...models.raft.corr import lookup_corr_pyramid
    pyramid, coords = res
    _, vjp = jax.vjp(
        lambda pyr, c: lookup_corr_pyramid(pyr, c, radius),
        pyramid, coords)
    d_pyr, d_coords = vjp(g)
    return d_pyr, d_coords


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lookup_corr_pyramid_fused(pyramid, coords, radius: int = 4,
                              interpret: bool = False):
    """Drop-in replacement for models.raft.corr.lookup_corr_pyramid.

    pyramid: list of [B, P, Hl, Wl]; coords [B, H1, W1, 2] (x, y) at level
    0 → [B, H1, W1, L*(2r+1)^2], reference channel order."""
    b, h1, w1, _ = coords.shape
    c = coords.reshape(b, h1 * w1, 2)
    out = _lookup_pyramid_pallas(pyramid, c, radius, interpret)
    return out.reshape(b, h1, w1, -1)


lookup_corr_pyramid_fused.defvjp(_lookup_fused_fwd, _lookup_fused_bwd)
