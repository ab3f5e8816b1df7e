"""Width-bucketed TC metric == exact per-shape TC.

The TC driver runs RAFT per adjacent frame pair of every val video
(reference: TC_cal.py:41-115); VSPW-480p widths vary per video, so the
exact path pays one XLA compile per distinct width.  ``--width_bucket``
runs the masked RAFT at the reference's symmetric-/8 geometry inside a
static bucket grid (models/raft/, ops/masked.py) — these tests prove the
bucketed score equals the exact score on synthetic multi-width videos.
"""

import os

import numpy as np
import pytest
from PIL import Image

from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
from cvpr2021_vspw_implement_tpu.tc_cal import build_parser, compute_tc


def _fixture(tmp_path, widths=(64, 72), h=48, frames=3, num_class=5):
    root = str(tmp_path / "tc_fix")
    predroot = str(tmp_path / "preds")
    rng = np.random.default_rng(11)
    videos = []
    for vi, w in enumerate(widths):
        sub = os.path.join(root, f"w{w}")
        make_synthetic_vspw(sub, 1, frames, (h, w), num_class, seed=vi,
                            splits=("val",))
        video = f"video_{vi:03d}w"
        src = os.path.join(sub, "data", "video_000")
        dst = os.path.join(root, "data", video)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(src, dst)
        videos.append(video)
        pdir = os.path.join(predroot, video)
        os.makedirs(pdir, exist_ok=True)
        for t in range(frames):
            pred = rng.integers(0, num_class, (h, w)).astype(np.uint8)
            Image.fromarray(pred).save(os.path.join(pdir, f"{t:08d}.png"))
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(videos) + "\n")
    return root, predroot


@pytest.mark.smoke
def test_tc_bucketed_matches_exact(tmp_path):
    root, predroot = _fixture(tmp_path)
    base = ["--dataroot", root, "--predroot", predroot,
            "--num_class", "5", "--raft_iters", "2", "--allow_random_raft"]
    exact = compute_tc(build_parser().parse_args(base))
    bucketed = compute_tc(build_parser().parse_args(
        base + ["--width_bucket", "32"]))
    # the masked instance-norm reduction introduces ~1e-5 relative feature
    # noise; with a handful of random-prediction pixels per class the TC
    # score must still agree to float precision of the confusion counts
    assert exact == pytest.approx(bucketed, abs=2e-3), (exact, bucketed)
