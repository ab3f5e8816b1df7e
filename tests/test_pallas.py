"""Pallas kernel correctness (interpret mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.ops.local_pairwise import (
    local_pairwise_dist, local_weighted_aggregate)
from cvpr2021_vspw_implement_tpu.ops.pallas.local_agg import (
    local_sigmoid_aggregate, local_softmax_aggregate)


@pytest.mark.parametrize("r,shape", [(2, (1, 6, 9, 8)), (3, (2, 8, 10, 16))])
def test_local_sigmoid_aggregate_matches_xla(r, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape, np.float32))
    y = jnp.asarray(rng.standard_normal(shape, np.float32))
    # distance emb and value features have different widths (WarpNet uses
    # 128-d emb_2 for distances and 256-d emb for values)
    yv = jnp.asarray(rng.standard_normal(shape[:3] + (shape[3] * 2,),
                                         np.float32))

    dist = local_pairwise_dist(x, y, r)
    wts = 1.0 - (jax.nn.sigmoid(dist.astype(jnp.float32)) - 0.5) * 2.0
    ref = local_weighted_aggregate(yv, wts, r) / (2 * r + 1) ** 2

    out = local_sigmoid_aggregate(x, y, yv, r, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("r", [1, 2])
def test_local_nearest_aggregate_matches_xla(r):
    from cvpr2021_vspw_implement_tpu.models.warp_our import warp_one_scale
    from cvpr2021_vspw_implement_tpu.ops.pallas.local_agg import (
        local_nearest_aggregate)
    rng = np.random.default_rng(2)
    shape = (2, 5, 7, 6)
    x = jnp.asarray(rng.standard_normal(shape, np.float32))
    y = jnp.asarray(rng.standard_normal(shape, np.float32))
    yv = jnp.asarray(rng.standard_normal(shape[:3] + (8,), np.float32))

    dist = local_pairwise_dist(x, y, r)
    ref = warp_one_scale(dist, yv, r, distsoftmax=False, distnearest=True,
                         temp=3.0, emb_dim=8)
    out = local_nearest_aggregate(x, y, yv, r, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("r", [1, 2])
def test_local_softmax_aggregate_matches_xla(r):
    from cvpr2021_vspw_implement_tpu.models.warp_our import warp_one_scale
    rng = np.random.default_rng(1)
    shape = (1, 5, 7, 6)
    # small-scale features so weights don't saturate
    x = jnp.asarray(rng.standard_normal(shape, np.float32) * 0.2)
    y = jnp.asarray(rng.standard_normal(shape, np.float32) * 0.2)
    yv = jnp.asarray(rng.standard_normal(shape[:3] + (8,), np.float32))

    dist = local_pairwise_dist(x, y, r)
    ref = warp_one_scale(dist, yv, r, distsoftmax=True, distnearest=False,
                         temp=3.0, emb_dim=8)
    out = local_softmax_aggregate(x, y, yv, r, temp=3.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
