"""Torch-exact bilinear/nearest resize as MXU matmuls.

The reference leans on ``F.interpolate(..., mode='bilinear',
align_corners=False)`` everywhere (e.g. models/models.py:96, 920-927) and on
``F.grid_sample`` for flow warping (utils.py:10-35).  Instead of porting a
gather loop, resize is expressed TPU-natively: separable 1-D interpolation is
a *dense matrix multiply* along H and then W with a precomputed static weight
matrix — exact to the reference semantics, and it runs on the MXU instead of
scalar gathers.

Layout: NHWC.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out, in] row-stochastic matrix replicating torch linear interpolation.

    Torch (align_corners=False): src = max(0, (dst + 0.5) * in/out - 0.5),
    x0 = floor(src), x1 = min(x0 + 1, in - 1), weight = src - x0.
    """
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = max(0.0, (i + 0.5) * in_size / out_size - 0.5)
        x0 = int(np.floor(src))
        x0 = min(x0, in_size - 1)
        x1 = min(x0 + 1, in_size - 1)
        lam = src - x0
        w[i, x0] += 1.0 - lam
        w[i, x1] += lam
    return w


@functools.lru_cache(maxsize=None)
def _nearest_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] one-hot matrix replicating torch legacy 'nearest' resize."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        src = min(int(np.floor(i * in_size / out_size)), in_size - 1)
        w[i, src] = 1.0
    return w


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of [N, H, W, C] (or [H, W, C]) to ``size`` = (h, w).

    Matches ``torch.nn.functional.interpolate(mode='bilinear')`` bit-for-bit
    in exact arithmetic (no antialiasing on downsample, half-pixel centers).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    out_h, out_w = size
    if (h, w) == (out_h, out_w):
        return x[0] if squeeze else x
    dt = x.dtype
    xf = x.astype(jnp.float32)
    if h != out_h:
        wh = jnp.asarray(_linear_weights(h, out_h, align_corners))
        xf = jnp.einsum("oh,nhwc->nowc", wh, xf)
    if w != out_w:
        ww = jnp.asarray(_linear_weights(w, out_w, align_corners))
        xf = jnp.einsum("ow,nhwc->nhoc", ww, xf)
    out = xf.astype(dt)
    return out[0] if squeeze else out


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of [N, H, W, C] to ``size``, torch legacy semantics."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    out_h, out_w = size
    if (h, w) == (out_h, out_w):
        return x[0] if squeeze else x
    # pure index gather — keeps integer dtypes intact for masks
    idx_h = np.minimum(np.floor(np.arange(out_h) * h / out_h), h - 1).astype(np.int32)
    idx_w = np.minimum(np.floor(np.arange(out_w) * w / out_w), w - 1).astype(np.int32)
    out = x[:, idx_h][:, :, idx_w]
    return out[0] if squeeze else out
