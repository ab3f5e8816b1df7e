"""Grid sampling and optical-flow warping (torch-exact semantics).

Replicates the reference's warping surface:
  * ``flowwarp`` (reference: utils.py:10-35, models/netwarp.py:12-37): build
    pixel grid + flow, normalize by (dim-1), then
    ``F.grid_sample(align_corners=False)`` with zero padding.  The reference's
    mixed convention (align_corners=True-style normalization, then
    align_corners=False sampling) is preserved exactly.
  * ``grid_sample`` bilinear/nearest used by RAFT's correlation lookup
    (RAFT_core/utils/utils.py:28-45) and the TC metric (TC_cal.py:12-37,
    nearest mode).

XLA formulation: the four bilinear taps are one-hot-free flat gathers over
[N, H*W, C]; out-of-bounds taps contribute zero (torch ``padding_mode='zeros'``).
A fused Pallas kernel backs the hot path on TPU (see ops/pallas/warp.py);
this module is the reference implementation and the CPU/interpret fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size, align_corners: bool) -> jnp.ndarray:
    """Map normalized [-1, 1] grid coords to pixel indices (torch semantics).
    ``size`` may be a python int or a traced runtime scalar (masked eval)."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(x: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Gather x[n, iy, ix, :] with zero fill for out-of-bounds indices.

    x: [N, H, W, C]; ix/iy: [N, Ho, Wo] int32.
    """
    n, h, w, c = x.shape
    valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    flat = x.reshape(n, h * w, c)
    idx = iyc * w + ixc  # [N, Ho, Wo]
    out = jnp.take_along_axis(
        flat, idx.reshape(n, -1, 1), axis=1
    ).reshape(*idx.shape, c)
    return out * valid[..., None].astype(x.dtype)


#: one-hot-matmul dispatch bounds: the [N, Ho*Wo, H*W] weight matrix must
#: stay small (bf16 bytes) and the channel count large enough that the MXU
#: matmul amortizes building it.
_ONEHOT_MAX_PQ = 128 * 1024 * 1024  # total f32 elements incl. batch (~512MB)
_ONEHOT_MIN_C = 128


def _gather_onehot(x, ix, iy, wts):
    """Σ_t wts_t(p) · x[iy_t(p), ix_t(p), :] as ONE dense matmul.

    TPU scalar/row gathers run at ~45 ns/element (measured on the corr
    lookup and on this warp: 7.1 ms for a [2,60,60,2048] bilinear warp);
    at feature resolution the 4-tap combination is a [P, P] matrix with 4
    nonzeros per row — built from iota compares and applied on the MXU it
    costs ~0.3 ms.  ix/iy/wts: lists of [N, Ho, Wo] taps (weights already
    include out-of-bounds zeroing).
    """
    n, h, w, c = x.shape
    ho, wo = ix[0].shape[1:]
    p = h * w
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, p), 3)
    wmat = None
    for jx, jy, wt in zip(ix, iy, wts):
        idx = (jnp.clip(jy, 0, h - 1) * w
               + jnp.clip(jx, 0, w - 1)).reshape(n, ho * wo, 1)
        one = (iota.reshape(1, 1, p) == idx)
        term = jnp.where(one, wt.reshape(n, ho * wo, 1)
                         .astype(jnp.float32), 0.0)
        wmat = term if wmat is None else wmat + term
    out = jnp.einsum("npq,nqc->npc", wmat.astype(x.dtype),
                     x.reshape(n, p, c))
    return out.reshape(n, ho, wo, c)


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear",
                align_corners: bool = False,
                onehot: bool | None = None, valid_hw=None) -> jnp.ndarray:
    """torch.nn.functional.grid_sample for NHWC inputs, zero padding.

    x:    [N, H, W, C]
    grid: [N, Ho, Wo, 2] normalized (gx, gy) in [-1, 1]
    ``onehot`` forces (True)/suppresses (False) the one-hot-matmul fast
    path; default auto-dispatches on TPU for small grids x wide channels.
    ``valid_hw``: runtime (rows, cols) of x's TRUE extent inside a
    width-bucketed zero-padded grid (ops/masked.py) — the unnormalize
    sizes and the out-of-bounds checks use the runtime sizes, so sampling
    the valid region equals the unpadded call exactly (taps between the
    valid and padded extents read masked zeros == torch's OOB zeros).
    """
    hs, ws = ((x.shape[1], x.shape[2]) if valid_hw is None
              else (valid_hw[0], valid_hw[1]))
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), ws, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), hs, align_corners)
    if onehot is None:
        # the weight matrix is [N, Ho*Wo, H*W] f32, so the bound must cover
        # the batch dim too or large-batch warps OOM where gathers fit
        pq = (x.shape[0] * x.shape[1] * x.shape[2]
              * grid.shape[1] * grid.shape[2])
        onehot = (jax.default_backend() not in ("cpu",)
                  and pq <= _ONEHOT_MAX_PQ and x.shape[-1] >= _ONEHOT_MIN_C)
    h, w = ((x.shape[1], x.shape[2]) if valid_hw is None
            else (valid_hw[0], valid_hw[1]))
    if mode == "nearest":
        # torch uses std::nearbyint → round-half-to-even, same as jnp.round
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        if onehot:
            valid = ((ix >= 0) & (ix <= w - 1)
                     & (iy >= 0) & (iy <= h - 1)).astype(jnp.float32)
            return _gather_onehot(x, [ix], [iy], [valid])
        return _gather_2d(x, ix, iy)
    if mode != "bilinear":
        raise ValueError(f"unsupported mode {mode!r}")
    x0f = jnp.floor(gx)
    y0f = jnp.floor(gy)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    if onehot:
        # tap weights carry the fractional terms in x.dtype exactly like
        # the gather path (lx/ly cast before the blend) and zero for OOB
        lxd = (gx - x0f).astype(x.dtype).astype(jnp.float32)
        lyd = (gy - y0f).astype(x.dtype).astype(jnp.float32)

        def v(jx, jy):
            return ((jx >= 0) & (jx <= w - 1)
                    & (jy >= 0) & (jy <= h - 1)).astype(jnp.float32)

        ixs = [x0, x0 + 1, x0, x0 + 1]
        iys = [y0, y0, y0 + 1, y0 + 1]
        wts = [(1 - lxd) * (1 - lyd) * v(x0, y0),
               lxd * (1 - lyd) * v(x0 + 1, y0),
               (1 - lxd) * lyd * v(x0, y0 + 1),
               lxd * lyd * v(x0 + 1, y0 + 1)]
        return _gather_onehot(x, ixs, iys, wts)
    lx = (gx - x0f).astype(x.dtype)[..., None]
    ly = (gy - y0f).astype(x.dtype)[..., None]
    v00 = _gather_2d(x, x0, y0)
    v01 = _gather_2d(x, x0 + 1, y0)
    v10 = _gather_2d(x, x0, y0 + 1)
    v11 = _gather_2d(x, x0 + 1, y0 + 1)
    top = v00 * (1 - lx) + v01 * lx
    bot = v10 * (1 - lx) + v11 * lx
    return top * (1 - ly) + bot * ly


def flowwarp(x: jnp.ndarray, flow: jnp.ndarray, mode: str = "bilinear",
             valid_hw=None) -> jnp.ndarray:
    """Warp image/features by optical flow (reference: utils.py:10-35).

    x:    [N, H, W, C] source (the frame being pulled back)
    flow: [N, H, W, 2] (fx, fy) in pixels
    ``valid_hw``: runtime true sizes for width-bucketed masked eval — the
    reference normalization uses the TRUE (dim-1), so the runtime sizes
    feed both the grid build and the sampler (see grid_sample).
    """
    n, h, w, _ = x.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    vx = xs + flow[..., 0].astype(jnp.float32)
    vy = ys + flow[..., 1].astype(jnp.float32)
    # reference normalizes by (dim-1) then samples align_corners=False
    if valid_hw is None:
        hs, ws = max(h - 1, 1), max(w - 1, 1)
    else:
        hs = jnp.maximum(valid_hw[0] - 1, 1).astype(jnp.float32)
        ws = jnp.maximum(valid_hw[1] - 1, 1).astype(jnp.float32)
    gx = 2.0 * vx / ws - 1.0
    gy = 2.0 * vy / hs - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample(x, grid, mode=mode, align_corners=False,
                       valid_hw=valid_hw)
