"""Pallas RAFT corr-lookup kernel == XLA reference path (interpret mode on
CPU; the same kernel compiles on TPU — the alt_cuda_corr equivalent)."""

import numpy as np

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.raft.corr import (
    build_corr_pyramid, lookup_corr_pyramid)
from cvpr2021_vspw_implement_tpu.ops.pallas.corr import (
    lookup_corr_pyramid_fused)


def _setup(b=2, h=6, w=9, c=16, seed=0):
    rng = np.random.default_rng(seed)
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, num_levels=3)
    # coords around the grid with fractional offsets, incl. out-of-range
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    dx = jnp.asarray(rng.uniform(-3.0, 3.0, (b, h, w)).astype(np.float32))
    dy = jnp.asarray(rng.uniform(-3.0, 3.0, (b, h, w)).astype(np.float32))
    coords = jnp.stack([xs + dx, ys + dy], axis=-1)
    return pyr, coords


def test_fused_lookup_matches_xla():
    pyr, coords = _setup()
    ref = lookup_corr_pyramid(pyr, coords, radius=2)
    got = lookup_corr_pyramid_fused(pyr, coords, 2, True)
    assert got.shape == ref.shape
    assert float(jnp.std(ref)) > 1e-3
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_lookup_nondivisible_tiles():
    # P = 6*9 = 54 (not a multiple of TILE_P=128) exercises the padding
    pyr, coords = _setup(b=1, h=6, w=9, seed=3)
    ref = lookup_corr_pyramid(pyr, coords, radius=3)
    got = lookup_corr_pyramid_fused(pyr, coords, 3, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_lookup_gradients_match_xla():
    pyr, coords = _setup(b=1, h=6, w=6, c=8, seed=5)

    def loss_fused(pyr, coords):
        return jnp.sum(jnp.sin(
            lookup_corr_pyramid_fused(pyr, coords, 2, True)))

    def loss_xla(pyr, coords):
        return jnp.sum(jnp.sin(lookup_corr_pyramid(pyr, coords, radius=2)))

    gf = jax.grad(loss_fused, argnums=(0, 1))(pyr, coords)
    gx = jax.grad(loss_xla, argnums=(0, 1))(pyr, coords)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bf16_pyramid_storage():
    """store_dtype=bf16 halves the lookup loop's HBM stream (corr.py):
    levels are stored bf16, both lookup paths upcast and return f32, and
    the result stays within bf16 storage-rounding of the f32 pyramid."""
    rng = np.random.default_rng(7)
    f1 = jnp.asarray(rng.standard_normal((1, 6, 9, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 6, 9, 16)).astype(np.float32))
    pyr32 = build_corr_pyramid(f1, f2, num_levels=3)
    pyr16 = build_corr_pyramid(f1, f2, num_levels=3,
                               store_dtype=jnp.bfloat16)
    assert all(p.dtype == jnp.bfloat16 for p in pyr16)

    _, coords = _setup(b=1, seed=7)
    ref = lookup_corr_pyramid(pyr32, coords, radius=2)
    for got in (lookup_corr_pyramid(pyr16, coords, radius=2),
                lookup_corr_pyramid_fused(pyr16, coords, 2, True)):
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


def test_onehot_lookup_matches_xla():
    """The MXU one-hot-matmul lookup (the TPU-default path in raft.py) ==
    the take_along_axis reference formulation, values and gradients."""
    from cvpr2021_vspw_implement_tpu.models.raft.corr import (
        lookup_corr_pyramid_onehot)

    pyr, coords = _setup(b=2, h=6, w=9, seed=7)
    ref = lookup_corr_pyramid(pyr, coords, radius=2)
    got = lookup_corr_pyramid_onehot(pyr, coords, radius=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # bf16-stored pyramid (the production refinement-loop storage)
    pyr16 = [c.astype(jnp.bfloat16) for c in pyr]
    ref16 = lookup_corr_pyramid(pyr16, coords, radius=2)
    got16 = lookup_corr_pyramid_onehot(pyr16, coords, radius=2)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref16),
                               rtol=1e-5, atol=1e-5)

    def loss_ref(pyr, coords):
        return jnp.sum(jnp.sin(lookup_corr_pyramid(pyr, coords, radius=2)))

    def loss_oh(pyr, coords):
        return jnp.sum(jnp.sin(
            lookup_corr_pyramid_onehot(pyr, coords, radius=2)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(pyr, coords)
    go = jax.grad(loss_oh, argnums=(0, 1))(pyr, coords)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(go)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
