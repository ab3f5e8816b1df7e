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


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map normalized [-1, 1] grid coords to pixel indices (torch semantics)."""
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


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear",
                align_corners: bool = False) -> jnp.ndarray:
    """torch.nn.functional.grid_sample for NHWC inputs, zero padding.

    x:    [N, H, W, C]
    grid: [N, Ho, Wo, 2] normalized (gx, gy) in [-1, 1]
    """
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), x.shape[2], align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), x.shape[1], align_corners)
    if mode == "nearest":
        # torch uses std::nearbyint → round-half-to-even, same as jnp.round
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        return _gather_2d(x, ix, iy)
    if mode != "bilinear":
        raise ValueError(f"unsupported mode {mode!r}")
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    lx = (gx - x0).astype(x.dtype)[..., None]
    ly = (gy - y0).astype(x.dtype)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    v00 = _gather_2d(x, x0, y0)
    v01 = _gather_2d(x, x0 + 1, y0)
    v10 = _gather_2d(x, x0, y0 + 1)
    v11 = _gather_2d(x, x0 + 1, y0 + 1)
    top = v00 * (1 - lx) + v01 * lx
    bot = v10 * (1 - lx) + v11 * lx
    return top * (1 - ly) + bot * ly


def flowwarp(x: jnp.ndarray, flow: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Warp image/features by optical flow (reference: utils.py:10-35).

    x:    [N, H, W, C] source (the frame being pulled back)
    flow: [N, H, W, 2] (fx, fy) in pixels
    """
    n, h, w, _ = x.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    vx = xs + flow[..., 0].astype(jnp.float32)
    vy = ys + flow[..., 1].astype(jnp.float32)
    # reference normalizes by (dim-1) then samples align_corners=False
    gx = 2.0 * vx / max(w - 1, 1) - 1.0
    gy = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample(x, grid, mode=mode, align_corners=False)
