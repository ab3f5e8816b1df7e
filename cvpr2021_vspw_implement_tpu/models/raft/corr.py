"""RAFT all-pairs correlation pyramid + windowed lookup.

Re-implements CorrBlock (reference: RAFT_core/corr.py:12-60): the all-pairs
correlation ``<f1, f2> / sqrt(C)`` is one big MXU matmul; the 4-level
pyramid average-pools the *second* image's spatial dims; the lookup bilinearly
samples a (2r+1)^2 window around each pixel's current correspondence at
every level (bilinear_sampler semantics: normalize by (dim-1),
align_corners=True, zero padding — RAFT_core/utils/utils.py:58-73).

TPU formulation: levels are stored as [B, H1*W1, H2l, W2l]; the window
lookup is a separable two-tap gather along H then W implemented with
``take_along_axis`` over the flattened level — no scatter, static shapes.
A Pallas kernel (ops/pallas/corr.py) provides the fused
``alt_cuda_corr``-style on-the-fly path (reference: RAFT/alt_cuda_corr).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_pairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """fmap1/fmap2: [B, H, W, C] → corr [B, H1*W1, H2, W2] (f32).

    The contraction runs in the fmaps' own dtype with f32 accumulation —
    bf16 inputs use the MXU's native bf16 path (like the reference's
    autocast matmul, RAFT_core/corr.py:54-58 under torch.cuda.amp)."""
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum("bpc,bqc->bpq", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(c))
    return corr.reshape(b, h * w, h, w)


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4,
                       store_dtype=None) -> list[jnp.ndarray]:
    """4-level pyramid; levels are STORED in ``store_dtype`` (default f32).

    The level-0 plane is the dominant HBM stream of the refinement loop —
    every lookup iteration re-reads P x Hl x Wl per level (~165 MB at
    RAFT-480p in f32) — so bf16 storage halves the loop's memory traffic.
    Pooling always accumulates from the f32 master; the lookup paths
    upcast to f32 before the bilinear weighting, so only the one storage
    rounding is introduced (mirrors the reference's half-precision corr
    under torch.cuda.amp)."""
    corr = all_pairs_correlation(fmap1, fmap2)
    sd = store_dtype or jnp.float32
    pyramid = [corr.astype(sd)]
    for _ in range(num_levels - 1):
        b, p, h, w = corr.shape
        # 2x2 average pool over the last two dims (floor semantics)
        h2, w2 = h // 2, w // 2
        corr = corr[:, :, :h2 * 2, :w2 * 2].reshape(b, p, h2, 2, w2, 2)
        corr = corr.mean(axis=(3, 5))
        pyramid.append(corr.astype(sd))
    return pyramid


def _lookup_level(corr: jnp.ndarray, coords: jnp.ndarray, r: int) -> jnp.ndarray:
    """Sample a (2r+1)^2 window around coords on one pyramid level.

    corr:   [B, P, Hl, Wl]  (P = H1*W1 query pixels)
    coords: [B, P, 2] (x, y) in this level's pixel units
    → [B, P, (2r+1)*(2r+1)]
    """
    b, p, hl, wl = corr.shape
    n_taps = 2 * r + 1
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)

    # window centers
    cx = coords[..., 0][..., None] + dx[None, None, :]   # [B, P, T]
    cy = coords[..., 1][..., None] + dx[None, None, :]   # [B, P, T]

    def taps(c, size):
        c0 = jnp.floor(c)
        lam = (c - c0).astype(jnp.float32)
        i0 = c0.astype(jnp.int32)
        i1 = i0 + 1
        v0 = (i0 >= 0) & (i0 <= size - 1)
        v1 = (i1 >= 0) & (i1 <= size - 1)
        return (jnp.clip(i0, 0, size - 1), (1 - lam) * v0,
                jnp.clip(i1, 0, size - 1), lam * v1)

    x0, wx0, x1, wx1 = taps(cx, wl)
    y0, wy0, y1, wy1 = taps(cy, hl)

    flat = corr.reshape(b, p, hl * wl)

    # Reference quirk preserved (RAFT_core/corr.py:36-42 + utils.py:58-66):
    # delta = meshgrid(dy, dx) is added to (x, y)-ordered coords, so the
    # OUTER window index offsets the x coordinate and the INNER index
    # offsets y — output channel (i, j) samples (x + dx_i, y + dy_j).
    def gather(iy, ix):
        # iy: [B,P,T] (inner tap → y), ix: [B,P,T] (outer tap → x)
        idx = iy[..., None, :] * wl + ix[..., :, None]
        return jnp.take_along_axis(flat, idx.reshape(b, p, -1),
                                   axis=-1).reshape(b, p, n_taps, n_taps)

    out = (gather(y0, x0) * (wy0[..., None, :] * wx0[..., :, None])
           + gather(y0, x1) * (wy0[..., None, :] * wx1[..., :, None])
           + gather(y1, x0) * (wy1[..., None, :] * wx0[..., :, None])
           + gather(y1, x1) * (wy1[..., None, :] * wx1[..., :, None]))
    return out.reshape(b, p, n_taps * n_taps)


def _lookup_level_onehot(corr: jnp.ndarray, coords: jnp.ndarray,
                         r: int) -> jnp.ndarray:
    """Gather-free formulation of ``_lookup_level``: the separable bilinear
    window sample is two batched ONE-HOT MATMULS on the MXU.

    Because all (2r+1) vertical taps share the fractional weight ``ly`` and
    differ only by an integer row offset, the y-stage weight matrix
    ``wy[b,p,ty,h]`` has exactly two diagonals — built from an iota
    comparison, no gather; out-of-range taps never match the iota, which IS
    the zero-padding semantics (utils.py:58-73).  The contraction
    ``einsum('bpth,bphw->bptw')`` then runs as a batched matmul instead of
    the take_along_axis path's flat scalar gathers (~112 ms/lookup on v5e)
    or a Pallas VPU mask-reduce (~5.6 ms): measured 0.4 ms at RAFT-480p
    (tools/raft_iter_micro.py).
    """
    b, p, hl, wl = corr.shape
    k = 2 * r + 1
    cx = coords[..., 0]                                   # [B, P]
    cy = coords[..., 1]

    def weights(c, size):
        c0 = jnp.floor(c)
        lam = (c - c0).astype(jnp.float32)[..., None, None]   # [B,P,1,1]
        i0 = c0.astype(jnp.int32)[..., None, None]
        taps = jnp.arange(-r, r + 1, dtype=jnp.int32).reshape(1, 1, k, 1)
        iota = jnp.arange(size, dtype=jnp.int32).reshape(1, 1, 1, size)
        base = i0 + taps                                      # [B,P,k,1]
        return ((iota == base) * (1.0 - lam)
                + (iota == base + 1) * lam)                   # [B,P,k,size]

    wy = weights(cy, hl)
    wx = weights(cx, wl)
    # HIGHEST precision: the one-hot weights/accumulate math must stay
    # f32 (parity with the gather path); the MXU's default bf16 passes
    # round lam and corr — measured 0.05 abs drift.  FLOPs are tiny
    # (<1 GFLOP at RAFT-480p), so the multi-pass f32 matmul is free.
    tmp = jnp.einsum("bpth,bphw->bptw", wy, corr.astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bpxw,bptw->bpxt", wx, tmp,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    # channel (tx, ty): outer tap = x, inner tap = y (reference quirk)
    return out.reshape(b, p, k * k)


def lookup_corr_pyramid_onehot(pyramid: list[jnp.ndarray],
                               coords: jnp.ndarray,
                               radius: int = 4) -> jnp.ndarray:
    """MXU one-hot-matmul lookup == ``lookup_corr_pyramid`` numerically
    (same f32 weight/accumulate math, same channel order)."""
    b, h1, w1, _ = coords.shape
    c = coords.reshape(b, h1 * w1, 2)
    outs = [_lookup_level_onehot(corr, c / (2.0 ** i), radius)
            for i, corr in enumerate(pyramid)]
    return jnp.concatenate(outs, axis=-1).reshape(b, h1, w1, -1)


def lookup_corr_pyramid(pyramid: list[jnp.ndarray], coords: jnp.ndarray,
                        radius: int = 4) -> jnp.ndarray:
    """coords: [B, H1, W1, 2] (x, y) at level 0 → [B, H1, W1, L*(2r+1)^2].

    Matches the reference's channel order: per level, window rows (dy) outer
    and columns (dx) inner (meshgrid(dy, dx), corr.py:37-39), levels
    concatenated (corr.py:48).
    """
    b, h1, w1, _ = coords.shape
    c = coords.reshape(b, h1 * w1, 2)
    outs = []
    for i, corr in enumerate(pyramid):
        outs.append(_lookup_level(corr, c / (2.0 ** i), radius))
    return jnp.concatenate(outs, axis=-1).reshape(b, h1, w1, -1)
