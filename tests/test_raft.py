"""RAFT subsystem tests: primitive parity vs torch + full-model parity
against the reference torch RAFT (random weights imported through the
torch→flax mapper) — the oracle for frozen-checkpoint fidelity."""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.raft import (
    RAFT, build_corr_pyramid, coords_grid, lookup_corr_pyramid,
    pad_to_multiple_of_8, unpad)
from cvpr2021_vspw_implement_tpu.models.raft.raft import upsample_flow_convex

REF = "/root/reference"
RNG = np.random.default_rng(0)


def test_corr_pyramid_matches_torch():
    f1 = RNG.standard_normal((2, 8, 10, 16), np.float32)
    f2 = RNG.standard_normal((2, 8, 10, 16), np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3)

    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(f2.transpose(0, 3, 1, 2))
    b, c, h, w = t1.shape
    corr = torch.matmul(t1.view(b, c, -1).transpose(1, 2),
                        t2.view(b, c, -1)) / np.sqrt(c)
    corr_t = corr.view(b, h * w, h, w)
    np.testing.assert_allclose(np.asarray(pyr[0]), corr_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    pooled = F.avg_pool2d(corr_t, 2, stride=2)
    np.testing.assert_allclose(np.asarray(pyr[1]), pooled.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_corr_lookup_matches_torch_bilinear_sampler():
    """Window lookup == reference bilinear_sampler (align_corners=True,
    (dim-1) normalization, zero padding) per level."""
    b, h, w, c = 1, 6, 7, 8
    r = 2
    f1 = RNG.standard_normal((b, h, w, c), np.float32)
    f2 = RNG.standard_normal((b, h, w, c), np.float32)
    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), 2)
    coords = coords_grid(b, h, w) + jnp.asarray(
        RNG.standard_normal((b, h, w, 2), np.float32) * 2)
    ours = np.asarray(lookup_corr_pyramid(pyr, coords, radius=r))

    # torch replica of CorrBlock.__call__
    out_levels = []
    for i, lvl in enumerate(pyr):
        corr = torch.from_numpy(np.asarray(lvl)).reshape(b * h * w, 1,
                                                         *lvl.shape[2:])
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), dim=-1)
        centroid = torch.from_numpy(np.asarray(coords)).reshape(
            b * h * w, 1, 1, 2) / 2 ** i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        hl, wl = lvl.shape[2:]
        xg = 2 * coords_lvl[..., 0] / (wl - 1) - 1
        yg = 2 * coords_lvl[..., 1] / (hl - 1) - 1
        grid = torch.stack([xg, yg], dim=-1)
        sampled = F.grid_sample(corr, grid, align_corners=True)
        out_levels.append(sampled.view(b, h, w, -1))
    ref = torch.cat(out_levels, dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_convex_upsample_matches_torch():
    b, h, w = 1, 4, 5
    flow = RNG.standard_normal((b, h, w, 2), np.float32)
    mask = RNG.standard_normal((b, h, w, 576), np.float32)
    ours = np.asarray(upsample_flow_convex(jnp.asarray(flow),
                                           jnp.asarray(mask)))

    ft = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    mt = torch.from_numpy(mask.transpose(0, 3, 1, 2))
    m = mt.view(b, 1, 9, 8, 8, h, w)
    m = torch.softmax(m, dim=2)
    up_flow = F.unfold(8 * ft, [3, 3], padding=1).view(b, 2, 9, 1, 1, h, w)
    up = torch.sum(m * up_flow, dim=2).permute(0, 1, 4, 2, 5, 3)
    ref = up.reshape(b, 2, 8 * h, 8 * w).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pad_unpad_roundtrip():
    x = jnp.asarray(RNG.standard_normal((1, 37, 50, 3), np.float32))
    padded, pads = pad_to_multiple_of_8(x)
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    np.testing.assert_array_equal(np.asarray(unpad(padded, pads)),
                                  np.asarray(x))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_full_raft_parity_with_reference_torch():
    """Random torch RAFT weights → importer → our RAFT: same flow field."""
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "RAFT_core"))
    try:
        from RAFT_core.raft import RAFT as TorchRAFT  # noqa
    finally:
        sys.path.pop(0), sys.path.pop(0)

    torch.manual_seed(0)
    tmodel = TorchRAFT(requires_grad=False)
    tmodel.eval()

    # note: ≥128 px so the coarsest corr level is ≥2x2 — the reference's
    # (dim-1) normalization divides by zero on 1x1 levels
    h, w, iters = 128, 144, 3
    img1 = RNG.random((1, h, w, 3), np.float32) * 255
    img2 = RNG.random((1, h, w, 3), np.float32) * 255
    with torch.no_grad():
        tlow, tup = tmodel(torch.from_numpy(img1.transpose(0, 3, 1, 2)),
                           torch.from_numpy(img2.transpose(0, 3, 1, 2)),
                           iters=iters, test_mode=True)

    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_raft_state_dict)
    variables = import_raft_state_dict(tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = RAFT(iters=iters)
    low, up = model.apply(variables, jnp.asarray(img1), jnp.asarray(img2),
                          test_mode=True)
    np.testing.assert_allclose(np.asarray(low),
                               tlow.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(up),
                               tup.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=2e-3)
