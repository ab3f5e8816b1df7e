"""Reference-RNG-compatible augmentation mode (``args.refrng``).

With the GLOBAL ``np.random`` / ``random`` streams seeded identically, our
datasets must reproduce the reference datasets' outputs draw-for-draw —
same reversal/anchor/flip/scale decisions, same crop offsets, same pixels.
(Reference consumption sites: dataset2.py:634-653 frame, 806-845 clip,
989-1010 longclip.)
"""

import argparse
import os
import random
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))
from test_fused_numeric import _ref_import  # noqa: E402
from test_golden_eval import _load_ref_toplevel  # noqa: E402

REF = "/root/reference"
K = 5

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
    r = str(tmp_path_factory.mktemp("vspw_refrng") / "vspw")
    make_synthetic_vspw(r, 2, 16, (48, 64), K, seed=51)
    return r


def _seed(s):
    np.random.seed(s)
    random.seed(s)


def _cmp_frame(ours, ref):
    o_img, o_lab = ours
    r_img, r_lab = ref
    np.testing.assert_allclose(o_img, r_img.numpy().transpose(1, 2, 0),
                               rtol=1e-5, atol=1e-6)
    r_l = r_lab.numpy()[0].astype(np.int64)
    np.testing.assert_array_equal(np.asarray(o_lab, np.int64), r_l)


def test_refrng_frame_dataset_matches_reference(root):
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")
    args = argparse.Namespace(dataroot=root, cropsize=40, trainfps=15,
                              multi_scale=False, lesslabel=False,
                              refrng=True, train_filter=False)
    ref_ds = ds2.BaseDataset(args, "train")

    from cvpr2021_vspw_implement_tpu.data.datasets import FrameDataset
    ours_ds = FrameDataset(args, "train")
    assert len(ours_ds) == len(ref_ds)

    for idx in range(min(6, len(ref_ds))):
        _seed(100 + idx)
        ref = ref_ds[idx]
        _seed(100 + idx)
        ours = ours_ds[idx]
        _cmp_frame(ours, ref)


def test_refrng_longclip_dataset_matches_reference(root):
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")
    args = argparse.Namespace(dataroot=root, cropsize=40, trainfps=15,
                              clip_num=4, dilation2="1,2,3",
                              multi_scale=False, lesslabel=False, refrng=True)
    ref_ds = ds2.BaseDataset_longclip(args, "train")

    from cvpr2021_vspw_implement_tpu.data.datasets import LongClipDataset
    args.dilation_num = 0
    ours_ds = LongClipDataset(args, "train")
    assert len(ours_ds) == len(ref_ds)

    for idx in range(len(ref_ds)):
        for s in (7, 8, 9):
            _seed(s)
            ref_imgs, ref_labs = ref_ds[idx]
            _seed(s)
            our_imgs, our_labs = ours_ds[idx]
            assert len(our_imgs) == len(ref_imgs)
            for o_i, o_l, r_i, r_l in zip(our_imgs, our_labs,
                                          ref_imgs, ref_labs):
                _cmp_frame((o_i, o_l), (r_i, r_l))


def test_refrng_clip_dataset_matches_reference(root):
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")
    args = argparse.Namespace(dataroot=root, cropsize=40, trainfps=15,
                              clip_num=3, dilation_num=1,
                              multi_scale=False, lesslabel=False, refrng=True)
    # reference BaseDataset_clip reads args.dilation_num as `dilation`
    ref_ds = ds2.BaseDataset_clip(args, "train")

    from cvpr2021_vspw_implement_tpu.data.datasets import ClipDataset
    ours_ds = ClipDataset(args, "train")
    assert len(ours_ds) == len(ref_ds)

    for idx in range(len(ref_ds)):
        for s in (21, 22):
            _seed(s)
            ref_imgs, ref_labs = ref_ds[idx]
            _seed(s)
            our_imgs, our_labs = ours_ds[idx]
            assert len(our_imgs) == len(ref_imgs)
            for o_i, o_l, r_i, r_l in zip(our_imgs, our_labs,
                                          ref_imgs, ref_labs):
                _cmp_frame((o_i, o_l), (r_i, r_l))


def test_refrng_multiscale_frame(root):
    """multi_scale draws + PIL resize must consume/produce identically."""
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")
    args = argparse.Namespace(dataroot=root, cropsize=38, trainfps=15,
                              multi_scale=True, lesslabel=False,
                              refrng=True, train_filter=False)
    ref_ds = ds2.BaseDataset(args, "train")
    from cvpr2021_vspw_implement_tpu.data.datasets import FrameDataset
    ours_ds = FrameDataset(args, "train")
    for idx in range(4):
        for s in (33, 34):
            _seed(s)
            try:
                ref = ref_ds[idx]
            except ValueError:
                # reference crashes when scale<1 shrinks below the crop
                # (its frame rand_crop never pads); skip those draws
                continue
            _seed(s)
            ours = ours_ds[idx]
            _cmp_frame(ours, ref)
