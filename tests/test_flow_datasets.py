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


def _write_png(path, hw, rng):
    Image.fromarray(rng.integers(0, 255, (*hw, 3), np.uint8)).save(path)


def test_hd1k_layout(tmp_path):
    """HD1K pairs consecutively WITHIN each 6-digit sequence prefix; the
    last frame of each sequence is dropped; flow is sparse KITTI-png
    (reference: RAFT_core/datasets.py:166-183)."""
    from cvpr2021_vspw_implement_tpu.models.raft.datasets import hd1k
    from cvpr2021_vspw_implement_tpu.models.raft.frame_utils import (
        write_kitti_png)

    rng = np.random.default_rng(9)
    hw = (18, 22)
    img_dir = tmp_path / "hd1k_input" / "image_2"
    flo_dir = tmp_path / "hd1k_flow_gt" / "flow_occ"
    img_dir.mkdir(parents=True)
    flo_dir.mkdir(parents=True)
    # two sequences: 3 frames and 2 frames -> 2 + 1 pairs
    for seq, n in ((0, 3), (1, 2)):
        for i in range(n):
            _write_png(img_dir / f"{seq:06d}_{i:04d}.png", hw, rng)
            flow = rng.standard_normal((*hw, 2)).astype(np.float32)
            valid = (rng.random(hw) > 0.5).astype(np.float32)
            write_kitti_png(str(flo_dir / f"{seq:06d}_{i:04d}.png"),
                            flow, valid)
    ds = hd1k(str(tmp_path))
    assert len(ds) == 3
    img1, img2, f, v = ds[0]
    assert img1.shape == (*hw, 3) and f.shape == (*hw, 2)
    assert set(np.unique(v)) <= {0.0, 1.0}
    # pair (i, i+1) within the sequence: img2 of pair 0 == img1 of pair 1
    a1, a2, _, _ = ds[0]
    b1, b2, _, _ = ds[1]
    np.testing.assert_array_equal(a2, b1)


def test_mixed_flow_dataset_weights():
    """MixedFlowDataset index mapping == torch ``m1*ds1 + m2*ds2``: the
    virtual length is sum(m*len) and uniform draws hit each member with
    probability proportional to its weighted size."""
    from cvpr2021_vspw_implement_tpu.models.raft.datasets import (
        MixedFlowDataset)

    class _Tag:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (self.tag, i)

    ds = MixedFlowDataset([(_Tag("a", 3), 100), (_Tag("b", 2), 5),
                           (_Tag("c", 4), 1)])
    assert len(ds) == 100 * 3 + 5 * 2 + 1 * 4
    # layout: first 300 indices cycle through a, next 10 through b, last 4 c
    assert ds[0] == ("a", 0) and ds[299] == ("a", 2)
    assert ds[300] == ("b", 0) and ds[309] == ("b", 1)
    assert ds[310] == ("c", 0) and ds[313] == ("c", 3)
    assert ds[-1] == ("c", 3)


def _build_sintel_stage_root(tmp_path, rng, hw=(40, 48)):
    """Synthetic datasets/ parent with all five sintel-stage members."""
    from cvpr2021_vspw_implement_tpu.models.raft.frame_utils import (
        write_kitti_png)

    # Sintel clean+final: one scene, 3 frames -> 2 pairs each
    for dstype in ("clean", "final"):
        scene = tmp_path / "Sintel" / "training" / dstype / "alley_1"
        scene.mkdir(parents=True)
        for i in range(3):
            _write_png(scene / f"frame_{i:04d}.png", hw, rng)
    flo = tmp_path / "Sintel" / "training" / "flow" / "alley_1"
    flo.mkdir(parents=True)
    for i in range(2):
        write_flo(str(flo / f"frame_{i:04d}.flo"),
                  rng.standard_normal((*hw, 2)).astype(np.float32))
    # KITTI: 2 pairs
    kimg = tmp_path / "KITTI" / "training" / "image_2"
    kflo = tmp_path / "KITTI" / "training" / "flow_occ"
    kimg.mkdir(parents=True)
    kflo.mkdir(parents=True)
    for i in range(2):
        _write_png(kimg / f"{i:06d}_10.png", hw, rng)
        _write_png(kimg / f"{i:06d}_11.png", hw, rng)
        write_kitti_png(str(kflo / f"{i:06d}_10.png"),
                        rng.standard_normal((*hw, 2)).astype(np.float32),
                        np.ones(hw, np.float32))
    # HD1K: one sequence of 3 frames -> 2 pairs
    himg = tmp_path / "HD1K" / "hd1k_input" / "image_2"
    hflo = tmp_path / "HD1K" / "hd1k_flow_gt" / "flow_occ"
    himg.mkdir(parents=True)
    hflo.mkdir(parents=True)
    for i in range(3):
        _write_png(himg / f"{0:06d}_{i:04d}.png", hw, rng)
        write_kitti_png(str(hflo / f"{0:06d}_{i:04d}.png"),
                        rng.standard_normal((*hw, 2)).astype(np.float32),
                        np.ones(hw, np.float32))
    # FlyingThings3D cleanpass: one dir of 2 frames -> 1 into_future +
    # 1 into_past pair
    tdir = tmp_path / "FlyingThings3D"
    idir = tdir / "frames_cleanpass" / "TRAIN" / "A" / "0000" / "left"
    fdir_f = tdir / "optical_flow" / "TRAIN" / "A" / "0000" / \
        "into_future" / "left"
    fdir_p = tdir / "optical_flow" / "TRAIN" / "A" / "0000" / \
        "into_past" / "left"
    for d in (idir, fdir_f, fdir_p):
        d.mkdir(parents=True)
    for i in range(2):
        _write_png(idir / f"{i:04d}.png", hw, rng)
    # minimal little-endian color PFM (frame_utils.read_pfm)
    import struct
    for d in (fdir_f, fdir_p):
        for i in range(2):
            data = rng.standard_normal((*hw, 3)).astype("<f4")
            with open(d / f"{i:04d}.pfm", "wb") as fh:
                fh.write(b"PF\n")
                fh.write(f"{hw[1]} {hw[0]}\n".encode())
                fh.write(b"-1.0\n")
                fh.write(data[::-1].tobytes())
    return tmp_path


def test_sintel_stage_mixture_composition(tmp_path):
    """The sintel training stage is the reference's weighted mixture
    100*clean + 100*final + 200*kitti + 5*hd1k + things with per-member
    aug params (RAFT_core/datasets.py:211-220) — weights pinned, every
    member reachable, augmented samples land at the crop size."""
    from cvpr2021_vspw_implement_tpu.raft_train import (SINTEL_MIX,
                                                        SINTEL_MIX_AUG,
                                                        fetch_dataset)

    assert SINTEL_MIX == (("sintel_clean", 100), ("sintel_final", 100),
                          ("kitti", 200), ("hd1k", 5), ("things_clean", 1))
    assert SINTEL_MIX_AUG["kitti"] == (-0.3, 0.5, True)
    assert SINTEL_MIX_AUG["hd1k"] == (-0.5, 0.2, True)
    assert SINTEL_MIX_AUG["sintel_clean"] == (-0.2, 0.6, True)

    rng = np.random.default_rng(10)
    root = _build_sintel_stage_root(tmp_path, rng)
    crop = (32, 32)
    ds = fetch_dataset("sintel", str(root), crop, seed=0)
    # 100*2 clean + 100*2 final + 200*2 kitti + 5*2 hd1k + 2 things
    assert len(ds) == 200 + 200 + 400 + 10 + 2
    sizes = dict(zip([n for n, _ in SINTEL_MIX], ds._sizes))
    assert sizes == {"sintel_clean": 200, "sintel_final": 200,
                     "kitti": 400, "hd1k": 10, "things_clean": 2}
    # one draw from each member region: augmented to the crop size with
    # the right density (dense -> all-ones valid; sparse -> 0/1 mask)
    starts = np.cumsum([0] + ds._sizes[:-1])
    for (name, _m), s in zip(SINTEL_MIX, starts):
        img1, img2, flow, valid = ds[int(s)]
        assert img1.shape == (*crop, 3), name
        assert flow.shape == (*crop, 2), name
        if name in ("kitti", "hd1k"):
            assert set(np.unique(valid)) <= {0.0, 1.0}, name
        else:
            np.testing.assert_array_equal(valid, np.ones(crop), name)


def test_sintel_stage_mixture_cts(tmp_path):
    """TRAIN_DS='C+T+K/S': 100*clean + 100*final + things, no kitti/hd1k
    (reference RAFT_core/datasets.py:222-224)."""
    from cvpr2021_vspw_implement_tpu.raft_train import fetch_dataset

    rng = np.random.default_rng(11)
    root = _build_sintel_stage_root(tmp_path, rng)
    ds = fetch_dataset("sintel", str(root), (32, 32), seed=0,
                       sintel_mix="C+T+K/S")
    assert len(ds) == 200 + 200 + 2


def test_colorjitter_np_hue_full_turn_identity():
    """A full hue turn (f=1.0) must be the identity up to rounding."""
    from cvpr2021_vspw_implement_tpu.models.raft.datasets import ColorJitterNP
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.float32)
    out = ColorJitterNP._shift_hue(img, 1.0)
    np.testing.assert_allclose(out, img, atol=1.0)
