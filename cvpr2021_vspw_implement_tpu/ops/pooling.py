"""Adaptive average pooling with exact torch bin semantics, as matmuls.

``nn.AdaptiveAvgPool2d(scale)`` drives every PPM head in the reference
(models/models.py:895-899, clip_psp.py:86-89).  Torch bins are
start = floor(i*H/out), end = ceil((i+1)*H/out); averaging over such bins is
a row-stochastic [out, in] matrix, so the pool becomes two small einsums that
XLA maps onto the MXU — no windows, no gathers.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _adaptive_pool_weights(in_size: int, out_size: int) -> np.ndarray:
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        w[i, start:end] = 1.0 / (end - start)
    return w


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """Adaptive average pool of [N, H, W, C] to (out_h, out_w)."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    n, h, w, c = x.shape
    out_h, out_w = output_size
    dt = x.dtype
    xf = x.astype(jnp.float32)
    if h != out_h:
        wh = jnp.asarray(_adaptive_pool_weights(h, out_h))
        xf = jnp.einsum("oh,nhwc->nowc", wh, xf)
    if w != out_w:
        ww = jnp.asarray(_adaptive_pool_weights(w, out_w))
        xf = jnp.einsum("ow,nhwc->nhoc", ww, xf)
    return xf.astype(dt)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def max_pool_3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(kernel=3, stride=2, padding=1) — the ResNet stem pool.

    Under an active width-bucket ``mask_context`` (ops/masked.py) the
    input's padded region is re-zeroed first: the pool is spatial, and
    the spatial-conv-input interceptor does not cover bare functions.
    Inputs are post-relu (non-negative), so zeros in the padded region
    reproduce the -inf edge padding of the unpadded run exactly."""
    import jax
    from .masked import current_mask, feature_valid, mask_valid
    ctx = current_mask()
    if ctx is not None:
        (vh, vw), (ph, pw) = ctx
        x = mask_valid(x, feature_valid(x.shape[1], x.shape[2],
                                        (vh, vw), (ph, pw)))
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
