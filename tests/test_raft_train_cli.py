"""Staged RAFT trainer CLI (reference: RAFT/train.py:136-247) — e2e smoke
on synthetic chairs-layout data, chairs-validator metric math, stage
presets, and the chairs-stage BN rule."""

import os

import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.models.raft.frame_utils import write_flo
from cvpr2021_vspw_implement_tpu.raft_train import (STAGE_PRESETS,
                                                    build_raft_train_parser,
                                                    train)


def _make_chairs(root, n=4, hw=(48, 56)):
    """Synthetic FlyingChairs_release layout + official split file."""
    from PIL import Image
    d = os.path.join(root, "FlyingChairs_release")
    os.makedirs(os.path.join(d, "data"))
    rng = np.random.default_rng(0)
    for i in range(n):
        for suffix in ("img1", "img2"):
            Image.fromarray(
                rng.integers(0, 255, (*hw, 3), dtype=np.uint8)).save(
                os.path.join(d, "data", f"{i:05d}_{suffix}.ppm"))
        write_flo(os.path.join(d, "data", f"{i:05d}_flow.flo"),
                  rng.uniform(-2, 2, (*hw, 2)).astype(np.float32))
    # last pair is the validation split (xid==2), rest train (xid==1)
    np.savetxt(os.path.join(d, "chairs_split.txt"),
               np.array([1] * (n - 1) + [2]), fmt="%d")
    return d


def test_raft_train_e2e_smoke(tmp_path):
    """Two steps of the chairs stage end to end: augmented loader, BN-
    updating jitted step, VAL_FREQ checkpoint + chairs validation, final
    checkpoint — finite losses throughout."""
    dataroot = _make_chairs(str(tmp_path))
    args = build_raft_train_parser().parse_args([
        "--stage", "chairs", "--dataroot", dataroot,
        "--val_dataroot", str(tmp_path),
        "--validation", "chairs",
        "--batch_size", "2", "--image_size", "32", "40",
        "--iters", "2", "--val_freq", "2", "--sum_freq", "1",
        "--ckpt_dir", str(tmp_path / "ckpts"), "--add_noise",
    ])
    variables, final = train(args, max_steps=2)
    assert os.path.exists(final)
    assert os.path.exists(str(tmp_path / "ckpts" / "2_raft.msgpack"))
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(variables)]
    assert all(np.isfinite(v).all() for v in leaves)
    # chairs stage must have UPDATED the BN statistics (RAFT/train.py:147)
    stats = variables["batch_stats"]
    means = [np.asarray(x) for k, x in
             __import__("jax").tree_util.tree_flatten_with_path(stats)[0]
             if "mean" in str(k[-1])]
    assert any(np.abs(m).max() > 0 for m in means)


def test_validate_chairs_metric_math():
    """Pooled-pixel EPE over the split, exactly RAFT/evaluate.py:21-35."""
    from cvpr2021_vspw_implement_tpu.models.raft.training import (
        validate_chairs)

    class _Stub:
        def __init__(self, flow):
            self.flow = flow

        def apply(self, variables, i1, i2, test_mode=False):
            import jax.numpy as jnp
            return None, jnp.asarray(self.flow[None])

    rng = np.random.default_rng(3)
    h, w = 16, 24
    items = [(rng.standard_normal((h, w, 3)).astype(np.float32),) * 2
             + (rng.uniform(-4, 4, (h, w, 2)).astype(np.float32),)
             for _ in range(3)]
    pred = rng.uniform(-4, 4, (h, w, 2)).astype(np.float32)
    got = validate_chairs(_Stub(pred), {}, items)
    want = np.mean(np.concatenate([
        np.sqrt(np.sum((pred - gt) ** 2, axis=-1)).reshape(-1)
        for _, _, gt in items]))
    np.testing.assert_allclose(got["chairs"], want, rtol=1e-6)


def test_stage_presets_match_reference():
    """Aug params per stage (RAFT_core/datasets.py:199-228)."""
    assert STAGE_PRESETS["chairs"] == (-0.1, 1.0, True)
    assert STAGE_PRESETS["things"] == (-0.4, 0.8, True)
    assert STAGE_PRESETS["sintel"] == (-0.2, 0.6, True)
    assert STAGE_PRESETS["kitti"] == (-0.2, 0.4, False)


def test_flying_chairs_split(tmp_path):
    from cvpr2021_vspw_implement_tpu.models.raft.datasets import (
        flying_chairs)
    root = _make_chairs(str(tmp_path), n=5)
    assert len(flying_chairs(root)) == 5
    assert len(flying_chairs(root, split="training")) == 4
    assert len(flying_chairs(root, split="validation")) == 1
    with pytest.raises(FileNotFoundError):
        flying_chairs(str(tmp_path), split="training")


def test_flying_things_layout_and_pfm(tmp_path):
    """FlyingThings pairing: into_future (i,i+1,flow_i) and into_past
    (i+1,i,flow_{i+1}) per reference RAFT_core/datasets.py:137-158."""
    from PIL import Image

    from cvpr2021_vspw_implement_tpu.models.raft.datasets import (
        flying_things)

    root = tmp_path / "things"
    idir = root / "frames_cleanpass" / "TRAIN" / "A" / "0000" / "left"
    fdir_f = root / "optical_flow" / "TRAIN" / "A" / "0000" / "into_future" / "left"
    fdir_p = root / "optical_flow" / "TRAIN" / "A" / "0000" / "into_past" / "left"
    for d in (idir, fdir_f, fdir_p):
        os.makedirs(d)
    rng = np.random.default_rng(1)
    h, w = 12, 16
    flows = {}
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                        ).save(idir / f"{i:04d}.png")
        for fdir, tag in ((fdir_f, "f"), (fdir_p, "p")):
            flow = rng.uniform(-3, 3, (h, w, 3)).astype(np.float32)
            flows[(tag, i)] = flow[:, :, :2]
            _write_pfm(str(fdir / f"{i:04d}.pfm"), flow)

    ds = flying_things(str(root))
    assert len(ds) == 4  # 2 future + 2 past pairs
    img1, img2, flow, valid = ds[0]
    assert flow.shape == (h, w, 2) and valid.shape == (h, w)
    np.testing.assert_allclose(flow, flows[("f", 0)], atol=1e-6)


def _write_pfm(path, img):
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        np.flipud(img).astype("<f4").tofile(f)


def test_raft_stage_chain_script(tmp_path):
    """scripts/run_raft_stages.sh (reference: RAFT/train_standard.sh):
    chairs -> things -> sintel -> kitti chained end to end with the
    checkpoint handed forward, 2 steps per stage on synthetic data; all
    four stage checkpoints must exist and the final weights be finite."""
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_flow_datasets import _build_sintel_stage_root

    rng = np.random.default_rng(20)
    root = _build_sintel_stage_root(tmp_path, rng, hw=(72, 88))
    _make_chairs(str(root), n=3, hw=(72, 88))
    # the things STAGE also trains on frames_finalpass (datasets.py:207-209)
    from PIL import Image
    tdir = root / "FlyingThings3D"
    fin = tdir / "frames_finalpass" / "TRAIN" / "A" / "0000" / "left"
    os.makedirs(fin)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (72, 88, 3), np.uint8)).save(
            fin / f"{i:04d}.png")

    ckpts = tmp_path / "ckpts"
    env = dict(os.environ,
               DATASETS=str(root), CKPTS=str(ckpts),
               NUM_STEPS="2", BATCH="1", CROP="64 64", ITERS="2", VAL="",
               JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "run_raft_stages.sh")],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-3000:]
    for name in ("raft-chairs", "raft-things", "raft-sintel", "raft-kitti"):
        assert (ckpts / f"{name}.msgpack").exists(), name
    import flax.serialization as ser
    with open(ckpts / "raft-kitti.msgpack", "rb") as f:
        tree = ser.msgpack_restore(f.read())
    import jax
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(tree))
