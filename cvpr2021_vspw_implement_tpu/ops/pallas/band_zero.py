"""Pallas TPU kernel: IN-PLACE re-zero of the bucketed-eval pad band.

The width-bucketed eval invariant (ops/masked.py) re-zeros the padded
region on every spatial-conv input.  Expressed as a full-tensor
``where`` that costs one HBM read+write of the whole activation per
masked conv (~35 us each on v5e, tools/interceptor_micro.py) even
though the bucketing contract confines every invalid element to the
last ``(m*h)//hp + 1`` rows / ``(m*w)//wp + 1`` cols (pad < m=64 input
px).  XLA refuses to narrow this itself: a dynamic_update_slice of the
band materializes a full-buffer copy instead of aliasing the dead
operand (measured 9.10 vs 6.23 ms/frame — ROADMAP round-4 note).

This kernel does what XLA wouldn't: ``input_output_aliases={1: 0}``
pins the output to the operand buffer, and the grid touches ONLY band
blocks — rows first, then columns — so bytes moved scale with the band
(~10-20% of the tensor), not the tensor.  Unvisited blocks are simply
never DMA'd; aliasing makes their contents the (unchanged) input.

Semantics: identical to ops/masked.mask_valid (proved for every
pyramid level in tests/test_pallas_band.py).

MEASURED NEGATIVE RESULT (kept off the dispatch path): on v5e R101
encode @512x896 (tools/interceptor_micro.py ``spatial_pallas``) this
measures 21.98 ms/frame vs 6.16 for the fused full-tensor where() and
4.90 unmasked — the two custom calls per masked conv break XLA's
fusion around the conv and serialize ~70 extra kernel dispatches per
frame, costing far more than the saved band bytes (~25 us/conv).
Byte-minimal masking loses to fusion-friendly masking at this
tensor:band ratio; the production interceptor stays on
ops/masked.mask_valid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_kernel(hv_ref, x_ref, o_ref, *, h: int, band_h: int):
    # the out block is DMA'd back unconditionally, so every visited
    # block must be written — still-valid band rows are copied through
    row = h - band_h + pl.program_id(1)
    o_ref[...] = jnp.where(row < hv_ref[0], x_ref[...],
                           jnp.zeros_like(x_ref))


def _col_kernel(wv_ref, x_ref, o_ref, *, w: int, blk_w: int,
                start_blk: int):
    c0 = (start_blk + pl.program_id(1)) * blk_w
    cols = jax.lax.broadcasted_iota(jnp.int32, (blk_w, 1), 0) + c0
    keep = (cols < wv_ref[0])[None, :, :]                # [1, blk_w, 1]
    o_ref[...] = jnp.where(keep, x_ref[...], jnp.zeros_like(x_ref))


def _band_extent(size: int, pad_in: int, m: int) -> int:
    return min(size, max(1, (m * size) // pad_in + 1))


def band_zero_inplace(x: jnp.ndarray, hv, wv, pad_hw,
                      bucket_multiple: int = 64,
                      interpret: bool = False) -> jnp.ndarray:
    """Re-zero rows >= hv / cols >= wv of [N,H,W,C] ``x`` in place.

    Equivalent to ``mask_valid(x, (hv_feat, wv_feat))`` given the
    bucketing pad bound; ``pad_hw`` is the INPUT-resolution padded size
    (static), ``hv``/``wv`` are the FEATURE-level valid sizes (traced
    scalars).  ``x`` must be dead at the call site — the output aliases
    its buffer."""
    n, h, w, c = x.shape
    band_h = _band_extent(h, pad_hw[0], bucket_multiple)
    band_w = _band_extent(w, pad_hw[1], bucket_multiple)
    hv1 = jnp.asarray(hv, jnp.int32).reshape(1)
    wv1 = jnp.asarray(wv, jnp.int32).reshape(1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    x = pl.pallas_call(
        functools.partial(_row_kernel, h=h, band_h=band_h),
        grid=(n, band_h),
        in_specs=[smem,
                  pl.BlockSpec((1, 1, w, c),
                               lambda i, j: (i, h - band_h + j, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, w, c),
                               lambda i, j: (i, h - band_h + j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(hv1, x)

    # column band: W is the sublane dim, so blocks must sit at
    # block-width-aligned offsets — widen the band down to a multiple
    # of blk_w and let the iota keep still-valid columns
    blk_w = 8
    start_blk = (w - band_w) // blk_w
    n_blk = w // blk_w - start_blk if w % blk_w == 0 \
        else pl.cdiv(w, blk_w) - start_blk
    x = pl.pallas_call(
        functools.partial(_col_kernel, w=w, blk_w=blk_w,
                          start_blk=start_blk),
        grid=(n, n_blk),
        in_specs=[smem,
                  pl.BlockSpec((1, h, blk_w, c),
                               lambda i, j: (i, 0, start_blk + j, 0))],
        out_specs=pl.BlockSpec((1, h, blk_w, c),
                               lambda i, j: (i, 0, start_blk + j, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(wv1, x)
    return x
