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
    aug = FlowAugmentor((12, 12), do_flip=True, brightness=0.0, seed=0)
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
