"""Golden end-to-end TC metric vs the reference TC_cal.py pipeline.

The reference script (TC_cal.py:41-115) is top-level code with hardcoded
paths, so its loop — RAFT(20 iters) flow per adjacent frame pair through
the symmetric /8 InputPadder, nearest flow-warp of the NEXT frame's
prediction, Evaluator mIoU over all pairs — is replicated here verbatim
with its own modules (RAFT_core.raft.RAFT, RAFT_core.utils.utils.
InputPadder, utils.Evaluator) as the oracle, on a synthetic fixture with
a shared random RAFT checkpoint.  Our tc_cal driver then runs the same
fixture from the same .pth.

Tolerance note: flow parity is ~1e-3 at f32 (tests/test_raft.py), and the
final warp samples integer labels with NEAREST interpolation — a flow
component landing within fp error of a half-integer boundary can flip
that pixel to the adjacent source pixel.  The assertion therefore allows
a tiny per-pixel mismatch fraction and a small TC-scalar tolerance
instead of exact equality (same reasoning as the argmax-tie allowance in
tests/test_golden_eval.py).
"""

import argparse
import os
import sys
from collections import OrderedDict

import numpy as np
import pytest
import torch
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from test_fused_numeric import _ref_import  # noqa: E402

REF = "/root/reference"
K = 5
H, W = 124, 130  # NOT /8-divisible (exercises the symmetric InputPadder);
# >=128 after padding because the torch corr pyramid needs H/64 >= 2

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _flowwarp_ref(x, flo):
    """The reference warp (TC_cal.py:12-37): nearest grid_sample at
    align_corners=False with (dim-1)-normalized flow coordinates."""
    B, C, Hh, Ww = x.size()
    xx = torch.arange(0, Ww).view(1, -1).repeat(Hh, 1)
    yy = torch.arange(0, Hh).view(-1, 1).repeat(1, Ww)
    xx = xx.view(1, 1, Hh, Ww).repeat(B, 1, 1, 1)
    yy = yy.view(1, 1, Hh, Ww).repeat(B, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + flo
    vgrid[:, 0] = 2.0 * vgrid[:, 0].clone() / max(Ww - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1].clone() / max(Hh - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    return torch.nn.functional.grid_sample(x, vgrid, mode="nearest",
                                           align_corners=False)


def test_golden_tc_matches_reference(tmp_path):
    from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
    from cvpr2021_vspw_implement_tpu.tc_cal import compute_tc

    root = str(tmp_path / "vspw")
    predroot = str(tmp_path / "preds")
    make_synthetic_vspw(root, 1, 4, (H, W), K, seed=70, splits=("val",))
    video = "video_000"

    # synthetic predictions: blob masks distinct from the GT ones
    rng = np.random.default_rng(71)
    os.makedirs(os.path.join(predroot, video), exist_ok=True)
    frames = sorted(os.listdir(os.path.join(root, "data", video, "origin")))
    for name in frames:
        yy, xx = np.mgrid[0:H, 0:W]
        cy, cx = rng.integers(0, H), rng.integers(0, W)
        m = np.full((H, W), int(rng.integers(0, K)), np.uint8)
        m[((xx - cx) ** 2 + (yy - cy) ** 2) < 150] = int(rng.integers(0, K))
        Image.fromarray(m, mode="P").save(
            os.path.join(predroot, video, os.path.splitext(name)[0] + ".png"))

    # shared random RAFT checkpoint (reference loads `module.`-prefixed)
    raft_mod = _ref_import("RAFT_core.raft")
    ru = _ref_import("RAFT_core.utils.utils")
    torch.manual_seed(14)
    tmodel = raft_mod.RAFT()
    tmodel.eval()
    ckpt = str(tmp_path / "raft-things.pth")
    torch.save(OrderedDict(("module." + k, v)
                           for k, v in tmodel.state_dict().items()), ckpt)

    # ---------------- reference TC loop (TC_cal.py:66-115) ----------------
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_utils_tc", os.path.join(REF, "utils.py"))
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)
    ev = ref_utils.Evaluator(K)
    ev.reset()
    ref_warps = {}
    with torch.no_grad():
        for i, name in enumerate(frames[:-1]):
            nxt = frames[i + 1]
            img1 = torch.from_numpy(np.array(Image.open(
                os.path.join(root, "data", video, "origin", name))))
            img2 = torch.from_numpy(np.array(Image.open(
                os.path.join(root, "data", video, "origin", nxt))))
            padder = ru.InputPadder(img1.size()[:2])
            im1 = padder.pad(img1.unsqueeze(0).permute(0, 3, 1, 2))
            im2 = padder.pad(img2.unsqueeze(0).permute(0, 3, 1, 2))
            _, flow = tmodel(im1.float(), im2.float(), iters=20,
                             test_mode=True)
            flow = padder.unpad(flow)
            stem = lambda s: os.path.splitext(s)[0] + ".png"
            pred = torch.from_numpy(np.array(Image.open(
                os.path.join(predroot, video, stem(name)))))
            next_pred = torch.from_numpy(np.array(Image.open(
                os.path.join(predroot, video, stem(nxt)))))
            warp = _flowwarp_ref(next_pred[None, None].float(), flow)
            warp = warp.int().squeeze(1).numpy()
            ev.add_batch(pred[None].numpy(), warp)
            ref_warps[name] = warp[0]
    ref_tc = ev.Mean_Intersection_over_Union()

    # ---------------- our tc_cal driver, same checkpoint -------------------
    args = argparse.Namespace(dataroot=root, predroot=predroot, split="val",
                              num_class=K, max_videos=0, raft_ckpt=ckpt,
                              raft_iters=20, allow_random_raft=False,
                              width_bucket=0)
    tc = compute_tc(args)

    assert abs(tc - ref_tc) < 2e-3, (tc, ref_tc)
