"""Numerical parity of core ops against torch CPU (the oracle).

The reference's behavior is defined by torch semantics (bilinear
align_corners=False, adaptive pool bins, grid_sample zero padding); these
tests pin our MXU-matmul formulations to them bit-for-bit (up to f32
accumulation order).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.ops.interpolate import resize_bilinear, resize_nearest
from cvpr2021_vspw_implement_tpu.ops.pooling import adaptive_avg_pool2d, max_pool_3x3_s2_p1
from cvpr2021_vspw_implement_tpu.ops.warp import flowwarp, grid_sample

RNG = np.random.default_rng(42)


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def to_nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((7, 9), (14, 18)), ((8, 8), (60, 60)), ((13, 17), (5, 6)),
    ((60, 107), (480, 853)), ((1, 1), (4, 4)),
])
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    x = RNG.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    ref = to_nhwc(F.interpolate(nchw(x), out_hw, mode="bilinear", align_corners=False))
    # atol 1e-4: matmul-formulated interpolation accumulates in a different
    # order than torch's two-tap loop; worst observed diff is ~4e-5 in f32.
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw,ac", [
    ((7, 9), (14, 18), False), ((60, 107), (480, 853), False),
    ((13, 17), (5, 6), False), ((6, 5), (11, 9), True),
    ((1, 1), (4, 4), False),
])
def test_resize_bilinear_taps_equals_matmul(in_hw, out_hw, ac):
    """The 2-tap gather oracle computes the identical interpolation (the
    matmul rows hold exactly these two non-zeros); on CPU both are true
    f32, so they agree to summation-order ulps."""
    from cvpr2021_vspw_implement_tpu.ops.interpolate import (
        resize_bilinear_taps)
    x = RNG.standard_normal((2, *in_hw, 3), dtype=np.float32)
    a = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=ac))
    b = np.asarray(resize_bilinear_taps(jnp.asarray(x), out_hw,
                                        align_corners=ac))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_resize_bilinear_precision_kwarg():
    """HIGHEST-precision resize is accepted and exact on CPU (the knob
    exists for TPU, where default MXU precision rounds f32 to bf16)."""
    import jax
    x = RNG.standard_normal((1, 6, 5, 2), dtype=np.float32)
    a = np.asarray(resize_bilinear(jnp.asarray(x), (11, 9)))
    b = np.asarray(resize_bilinear(jnp.asarray(x), (11, 9),
                                   precision=jax.lax.Precision.HIGHEST))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_resize_bilinear_align_corners_true():
    x = RNG.standard_normal((1, 6, 5, 2), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (11, 9), align_corners=True))
    ref = to_nhwc(F.interpolate(nchw(x), (11, 9), mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((7, 9), (13, 4)), ((480, 853), (60, 107))])
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = RNG.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = to_nhwc(F.interpolate(nchw(x), out_hw, mode="nearest"))
    np.testing.assert_allclose(ours, ref)


@pytest.mark.parametrize("in_hw,out", [
    ((60, 60), 1), ((60, 60), 2), ((60, 60), 3), ((60, 60), 6),
    ((59, 61), 6), ((7, 5), 3),
])
def test_adaptive_avg_pool_matches_torch(in_hw, out):
    x = RNG.standard_normal((2, *in_hw, 4), dtype=np.float32)
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out))
    ref = to_nhwc(F.adaptive_avg_pool2d(nchw(x), out))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_max_pool_stem_matches_torch():
    x = RNG.standard_normal((2, 16, 17, 3), dtype=np.float32)
    ours = np.asarray(max_pool_3x3_s2_p1(jnp.asarray(x)))
    ref = to_nhwc(F.max_pool_2d(nchw(x), 3, 2, 1)) if hasattr(F, "max_pool_2d") \
        else to_nhwc(F.max_pool2d(nchw(x), 3, 2, 1))
    np.testing.assert_allclose(ours, ref)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(mode, align_corners):
    x = RNG.standard_normal((2, 9, 11, 3), dtype=np.float32)
    grid = (RNG.random((2, 7, 8, 2), dtype=np.float32) * 2.4 - 1.2)  # incl. OOB
    ours = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                  mode=mode, align_corners=align_corners))
    ref = F.grid_sample(nchw(x), torch.from_numpy(grid), mode=mode,
                        padding_mode="zeros", align_corners=align_corners)
    np.testing.assert_allclose(ours, to_nhwc(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_flowwarp_matches_reference_formula(mode):
    """Reference flowwarp = grid+flow, (dim-1) normalize, align_corners=False
    sample (reference: utils.py:10-35, TC_cal.py:12-37 nearest variant)."""
    x = RNG.standard_normal((2, 8, 10, 3), dtype=np.float32)
    flow = RNG.standard_normal((2, 8, 10, 2), dtype=np.float32) * 2.0

    # torch replica of the reference formula
    xt = nchw(x)
    ft = nchw(flow)
    b, c, h, w = xt.shape
    xx = torch.arange(w).view(1, -1).repeat(h, 1).view(1, 1, h, w).repeat(b, 1, 1, 1)
    yy = torch.arange(h).view(-1, 1).repeat(1, w).view(1, 1, h, w).repeat(b, 1, 1, 1)
    vgrid = torch.cat((xx, yy), 1).float() + ft
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
    ref = F.grid_sample(xt, vgrid.permute(0, 2, 3, 1), mode=mode,
                        align_corners=False)

    ours = np.asarray(flowwarp(jnp.asarray(x), jnp.asarray(flow), mode=mode))
    np.testing.assert_allclose(ours, to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_grid_sample_onehot_path_matches_gather():
    """The MXU one-hot-matmul warp fast path == the gather path (both
    modes, OOB coords included)."""
    from cvpr2021_vspw_implement_tpu.ops.warp import flowwarp, grid_sample
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 160)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.4, 1.4, (2, 7, 8, 2)).astype(np.float32))
    for mode in ("bilinear", "nearest"):
        a = grid_sample(x, grid, mode=mode, onehot=False)
        b = grid_sample(x, grid, mode=mode, onehot=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
