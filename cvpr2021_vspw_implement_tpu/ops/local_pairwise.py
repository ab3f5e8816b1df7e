"""Local squared-distance cost volumes (reference: models/warp_our.py:20-50).

``local_pairwise_dist(x, y, r)`` computes, for every pixel of x, the squared
L2 distance to every pixel of y inside a (2r+1)^2 window:
``dist = |x|^2 + |y_off|^2 - 2 <x, y_off>`` with out-of-bounds positions at
+1e20 (the reference pads y with 0 and |y|^2 with 1e20).

TPU formulation: the reference materializes an unfold of shape
[N, HW, C, k^2] (the main memory hog of the warp methods).  Here each row
offset dy contributes one [W, W+2r] banded matmul on the MXU followed by a
static band gather — memory O(HW·k) instead of O(HW·C·k^2), and all FLOPs
land on the systolic array.  ``local_window_gather`` extracts the matching
y-windows for aggregation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def local_pairwise_dist(x: jnp.ndarray, y: jnp.ndarray, r: int,
                        valid_hw=None) -> jnp.ndarray:
    """x, y: [B, H, W, C] → dists [B, H, W, k, k] (dy outer, dx inner).

    ``valid_hw``: runtime (rows, cols) of the TRUE feature map inside a
    width-bucketed zero-padded buffer — positions at-or-beyond the valid
    size get |y|^2 = 1e20 and y = 0, exactly the out-of-bounds treatment
    the unpadded run applies at its true boundary, so the cost volume on
    the valid region is identical (incl. the argmax tie order the
    ``distnearest`` quirk relies on)."""
    b, h, w, c = x.shape
    k = 2 * r + 1
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    if valid_hw is not None:
        hv, wv = valid_hw
        mh = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) < hv
        mw = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < wv
        inb = (mh & mw)[None]
        yf = jnp.where(inb[..., None], yf, 0.0)
    x2 = jnp.sum(jnp.square(xf), axis=-1)                     # [B, H, W]
    y2 = jnp.sum(jnp.square(yf), axis=-1)
    if valid_hw is not None:
        y2 = jnp.where(inb, y2, 1e20)
    y_pad = jnp.pad(yf, ((0, 0), (r, r), (r, r), (0, 0)))
    y2_pad = jnp.pad(y2, ((0, 0), (r, r), (r, r)), constant_values=1e20)

    band_idx = (np.arange(w)[:, None] + np.arange(k)[None, :])  # [W, k]
    band_idx = jnp.asarray(band_idx)

    rows = []
    for dy in range(k):
        y_sl = y_pad[:, dy:dy + h]                            # [B, H, W+2r, C]
        y2_sl = y2_pad[:, dy:dy + h]                          # [B, H, W+2r]
        m = jnp.einsum("bhwc,bhvc->bhwv", xf, y_sl)           # [B, H, W, W+2r]
        band = jnp.take_along_axis(
            m, jnp.broadcast_to(band_idx, (b, h, w, k)), axis=-1)
        y2_band = jnp.take_along_axis(
            jnp.broadcast_to(y2_sl[:, :, None, :], (b, h, w, w + 2 * r)),
            jnp.broadcast_to(band_idx, (b, h, w, k)), axis=-1)
        rows.append(x2[..., None] + y2_band - 2.0 * band)
    return jnp.stack(rows, axis=3)                            # [B,H,W,k,k]


def local_weighted_aggregate(y: jnp.ndarray, weights: jnp.ndarray,
                             r: int) -> jnp.ndarray:
    """Σ_{dy,dx} weights[..., dy, dx] * y[h+dy-r, w+dx-r] without
    materializing windows.

    y: [B, H, W, C]; weights: [B, H, W, k, k] → [B, H, W, C].
    Per row-offset the band weights are scattered to a dense [W, W+2r]
    matrix via a static one-hot and contracted with y on the MXU.
    """
    b, h, w, c = y.shape
    k = 2 * r + 1
    yf = y.astype(jnp.float32)
    wf = weights.astype(jnp.float32)
    y_pad = jnp.pad(yf, ((0, 0), (r, r), (r, r), (0, 0)))
    # onehot[w, k, v] = 1 iff v == w + k  (static, tiny)
    onehot = np.zeros((w, k, w + 2 * r), np.float32)
    for wi in range(w):
        for ki in range(k):
            onehot[wi, ki, wi + ki] = 1.0
    onehot = jnp.asarray(onehot)
    out = jnp.zeros((b, h, w, c), jnp.float32)
    for dy in range(k):
        y_sl = y_pad[:, dy:dy + h]                            # [B,H,W+2r,C]
        w_dense = jnp.einsum("bhwk,wkv->bhwv", wf[:, :, :, dy], onehot)
        out = out + jnp.einsum("bhwv,bhvc->bhwc", w_dense, y_sl)
    return out.astype(y.dtype)


def local_window_gather(y: jnp.ndarray, r: int,
                        pad_value: float = 0.0) -> jnp.ndarray:
    """y: [B, H, W, C] → windows [B, H, W, k, k, C] (pad_value outside),
    window order (dy outer, dx inner) matching ``local_pairwise_dist``."""
    b, h, w, c = y.shape
    k = 2 * r + 1
    y_pad = jnp.pad(y, ((0, 0), (r, r), (r, r), (0, 0)),
                    constant_values=pad_value)
    rows = []
    for dy in range(k):
        cols = [y_pad[:, dy:dy + h, dx:dx + w, :] for dx in range(k)]
        rows.append(jnp.stack(cols, axis=3))                  # [B,H,W,k,C]
    return jnp.stack(rows, axis=3)                            # [B,H,W,k,k,C]
