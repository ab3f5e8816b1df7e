"""Flow dataset loaders + augmentor tests on synthetic files."""

import os

import numpy as np
from PIL import Image

from cvpr2021_vspw_implement_tpu.models.raft.datasets import (
    FlowAugmentor, FlowPairDataset, flying_chairs, sintel)
from cvpr2021_vspw_implement_tpu.models.raft.frame_utils import write_flo


def _write_pair(d, stem, hw=(20, 24)):
    rng = np.random.default_rng(0)
    for suffix in ("img1", "img2"):
        Image.fromarray(rng.integers(0, 255, (*hw, 3), np.uint8)).save(
            os.path.join(d, f"{stem}_{suffix}.ppm"))
    write_flo(os.path.join(d, f"{stem}_flow.flo"),
              rng.standard_normal((*hw, 2)).astype(np.float32))


def test_flying_chairs_layout(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    for i in range(3):
        _write_pair(str(d), f"{i:05d}")
    ds = flying_chairs(str(tmp_path))
    assert len(ds) == 3
    img1, img2, flow, valid = ds[0]
    assert img1.shape == (20, 24, 3) and flow.shape == (20, 24, 2)
    assert valid.shape == (20, 24)


def test_augmentor_flip_flow_signs(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (16, 18, 3)).astype(np.float32)
    flow = np.ones((16, 18, 2), np.float32)
    aug = FlowAugmentor((12, 12), do_flip=True, seed=0)
    aug.spatial_aug_prob = -1.0  # disable resize so flow values stay +-1
    seen_flip = False
    for _ in range(20):
        _, _, f, v = aug(img, img, flow)
        assert f.shape == (12, 12, 2) and v.shape == (12, 12)
        # any flip must negate exactly the corresponding component
        assert set(np.unique(f[..., 0])) <= {1.0, -1.0}
        if f[0, 0, 0] == -1.0:
            seen_flip = True
    assert seen_flip


def test_sintel_layout(tmp_path):
    scene = tmp_path / "training" / "clean" / "alley_1"
    flow = tmp_path / "training" / "flow" / "alley_1"
    scene.mkdir(parents=True)
    flow.mkdir(parents=True)
    rng = np.random.default_rng(2)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (14, 16, 3), np.uint8)).save(
            scene / f"frame_{i:04d}.png")
    for i in range(2):
        write_flo(str(flow / f"frame_{i:04d}.flo"),
                  rng.standard_normal((14, 16, 2)).astype(np.float32))
    ds = sintel(str(tmp_path))
    assert len(ds) == 2
    img1, img2, f, v = ds[1]
    assert f.shape == (14, 16, 2)


def test_full_augmentor_scale_and_flow_consistency():
    """Spatial scaling must rescale flow VALUES by the same per-axis factors
    (reference: augmentor.py:85-90) and output the crop size."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (60, 80, 3)).astype(np.float32)
    flow = np.full((60, 80, 2), 2.0, np.float32)
    aug = FlowAugmentor((32, 32), min_scale=0.3, max_scale=0.3, seed=3)
    aug.stretch_prob = -1.0        # isolate the uniform scale
    aug.spatial_aug_prob = 2.0     # always resize
    aug.h_flip_prob = aug.v_flip_prob = -1.0
    i1, i2, f, v = aug(img, img, flow)
    assert i1.shape == (32, 32, 3) and f.shape == (32, 32, 2)
    scale = 2 ** 0.3
    # interior flow values = 2 * scale on both axes (edges may blend)
    np.testing.assert_allclose(f[8:-8, 8:-8], 2.0 * scale, rtol=1e-2)


def test_full_augmentor_eraser_patches():
    """Eraser paints img2 rectangles with img2's mean color, img1 untouched
    (reference: augmentor.py:52-65)."""
    from cvpr2021_vspw_implement_tpu.models.raft.datasets import (
        FlowAugmentor)
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (120, 140, 3)).astype(np.float32)
    flow = np.zeros((120, 140, 2), np.float32)
    hit = False
    for seed in range(8):
        aug = FlowAugmentor((100, 100), seed=seed)
        aug.spatial_aug_prob = -1.0
        aug.h_flip_prob = aug.v_flip_prob = -1.0
        aug.asymmetric_color_aug_prob = -1.0
        aug.photo_aug.brightness = aug.photo_aug.contrast = 0
        aug.photo_aug.saturation = aug.photo_aug.hue = 0
        aug.eraser_aug_prob = 2.0  # always erase
        i1, i2, _, _ = aug(img.copy(), img.copy(), flow)
        diff = np.any(i1 != i2)
        hit = hit or bool(diff)
    assert hit, "eraser never painted a patch"


def test_sparse_resize_flow_map_splat():
    """Sparse resize splats valid flow vectors to rounded target coords and
    rescales them (reference: augmentor.py:161-194)."""
    from cvpr2021_vspw_implement_tpu.models.raft.datasets import (
        SparseFlowAugmentor)
    flow = np.zeros((10, 10, 2), np.float32)
    valid = np.zeros((10, 10), np.float32)
    flow[4, 6] = (3.0, -2.0)
    valid[4, 6] = 1.0
    f2, v2 = SparseFlowAugmentor.resize_sparse_flow_map(flow, valid,
                                                        fx=2.0, fy=2.0)
    assert f2.shape == (20, 20, 2) and v2.shape == (20, 20)
    assert v2.sum() == 1
    yy, xx = np.argwhere(v2 == 1)[0]
    assert (yy, xx) == (8, 12)
    np.testing.assert_allclose(f2[yy, xx], [6.0, -4.0])


def test_colorjitter_np_identity_and_range():
    from cvpr2021_vspw_implement_tpu.models.raft.datasets import ColorJitterNP
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (24, 24, 3)).astype(np.uint8)
    ident = ColorJitterNP(0, 0, 0, 0, np.random.default_rng(0))
    np.testing.assert_array_equal(ident(img), img)
    jit = ColorJitterNP(0.4, 0.4, 0.4, 0.5 / 3.14, np.random.default_rng(1))
    out = jit(img)
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert np.any(out != img)


def test_colorjitter_np_hue_full_turn_identity():
    """A full hue turn (f=1.0) must be the identity up to rounding."""
    from cvpr2021_vspw_implement_tpu.models.raft.datasets import ColorJitterNP
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.float32)
    out = ColorJitterNP._shift_hue(img, 1.0)
    np.testing.assert_allclose(out, img, atol=1.0)
