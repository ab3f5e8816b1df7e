"""Golden end-to-end prediction equality vs the reference torch pipeline.

Runs the REFERENCE eval pipeline (its real datasets — dataset2.TestDataset /
TestDataset_longclip — and its real model modules, mirroring the driver
loops test.py:52-89 / test_clip2.py:28-89) on the synthetic VSPW fixture
with a fixed random checkpoint, then runs OUR CLI eval on the same fixture
loading the SAME torch checkpoint via --torch_enc/--torch_dec (per-frame)
and --torch_load (fused clip_psp), and asserts the dumped prediction masks
are pixel-identical and the metrics agree.

This replaces the vacuous `0 <= mIoU <= 1` assertion that used to be the
only end-to-end torch-checkpoint test.
"""

import argparse
import importlib.util
import os
import sys

import numpy as np
import pytest
import torch
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from test_fused_numeric import _randomize, _ref_import  # noqa: E402

REF = "/root/reference"
K = 5

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _load_ref_toplevel(fname, name):
    """Load a top-level reference module (dataset2, utils) by file path."""
    _ref_import("models.models")  # ensures the torchvision stub is in place
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, fname))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _fixture(tmp_path, seed):
    from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
    root = str(tmp_path / "vspw")
    make_synthetic_vspw(root, 1, 8, (48, 64), K, seed=seed)
    return root


def _compare_pred_dirs(ref_preds, our_dir, video):
    """ref_preds: {fname: np.array}; our_dir holds palette PNGs."""
    total = mismatched = 0
    for fname, ref in ref_preds.items():
        ours = np.array(Image.open(os.path.join(our_dir, video, fname)))
        assert ours.shape == ref.shape
        total += ref.size
        mismatched += int((ours != ref).sum())
    assert total > 0
    frac = mismatched / total
    # identical modulo fp argmax ties on class-boundary pixels
    assert frac == 0.0, f"{mismatched}/{total} pixels differ ({frac:.2%})"


@pytest.mark.parametrize("dec_arch", ["ppm_deepsup", "c1"])
def test_golden_frame_eval_psp(tmp_path, dec_arch):
    root = _fixture(tmp_path, seed=31)
    video = "video_000"

    # ---------------- reference pipeline (torch, CPU) ----------------
    mm = _ref_import("models.models")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")
    rutils = _load_ref_toplevel("utils.py", "ref_utils")

    torch.manual_seed(0)
    enc = mm.ModelBuilder.build_encoder("resnet18dilated", weights="")
    dec = mm.ModelBuilder.build_decoder(dec_arch, fc_dim=512,
                                        num_class=K, use_softmax=True)
    seg = mm.SegmentationModule(enc, dec, torch.nn.NLLLoss(ignore_index=-1))
    _randomize(seg, seed=41)
    seg.eval()

    enc_ckpt = str(tmp_path / "encoder_epoch_1.pth")
    dec_ckpt = str(tmp_path / "decoder_epoch_1.pth")
    torch.save(enc.state_dict(), enc_ckpt)
    torch.save(dec.state_dict(), dec_ckpt)

    dargs = argparse.Namespace(lesslabel=False, use_720p=False)
    ds = ds2.TestDataset(root, video, dargs)
    ref_ev = rutils.Evaluator(K)
    ref_ev.reset()
    ref_preds = {}
    for i in range(len(ds)):
        img, gt, gtname = ds[i]
        feed = {"img_data": img[None], "seg_label": gt[None]}
        with torch.no_grad():
            scores = seg(feed, segSize=img.shape[-2:])
        pred = torch.argmax(scores, dim=1).numpy()[0]
        ref_ev.add_batch(gt.squeeze(0).numpy()[None], pred[None])
        ref_preds[gtname] = pred.astype(np.uint8)
    ref_miou = ref_ev.Mean_Intersection_over_Union()

    # ---------------- our CLI eval, same torch checkpoint ----------------
    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test import evaluate

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = dec_arch
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = argparse.Namespace(dataroot=root, split="val", num_class=K,
                              load="", torch_enc=enc_ckpt,
                              torch_dec=dec_ckpt, saveroot=saveroot,
                              lesslabel=False, use_720p=False)
    metrics, _ = evaluate(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)


def test_golden_clip_eval_clip_psp(tmp_path):
    root = _fixture(tmp_path, seed=32)
    video = "video_000"

    # ---------------- reference pipeline (torch, CPU) ----------------
    mm = _ref_import("models.models")
    ref_clip_psp = _ref_import("models.clip_psp")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")
    rutils = _load_ref_toplevel("utils.py", "ref_utils")

    margs = argparse.Namespace(num_class=K, psp_weight=False, clip_num=4,
                               dilation2="1,2,3", lesslabel=False,
                               use_720p=False, use_memory=False)
    torch.manual_seed(1)
    # the reference Clip_PSP hardcodes fc_dim=2048 (clip_psp.py:70)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    tmodel = ref_clip_psp.Clip_PSP(enc, torch.nn.NLLLoss(ignore_index=255),
                                   margs, deep_sup_scale=0.4)
    _randomize(tmodel, seed=42)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    ds = ds2.TestDataset_longclip(root, video, margs)
    ref_ev = rutils.Evaluator(K)
    ref_ev.reset()
    ref_preds = {}
    for i in range(len(ds)):
        img, gt, clip_imgs, _lbls, gtname = ds[i]
        feed = {"img_data": img[None], "seg_label": gt[None],
                "clipimgs_data": [c[None] for c in clip_imgs]}
        with torch.no_grad():
            scores = tmodel(feed, segSize=img.shape[-2:])
        pred = torch.argmax(scores, dim=1).numpy()[0]
        ref_ev.add_batch(gt.squeeze(0).numpy()[None], pred[None])
        ref_preds[gtname.split(".")[0] + ".png"] = pred.astype(np.uint8)
    ref_miou = ref_ev.Mean_Intersection_over_Union()

    # ---------------- our CLI clip eval, same fused checkpoint -----------
    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 2048
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = argparse.Namespace(
        dataroot=root, split="val", num_class=K, method="clip_psp",
        clip_num=4, dilation_num=0, dilation2="1,2,3", load="",
        torch_load=fused_ckpt, saveroot=saveroot, is_save=True,
        lesslabel=False, use_720p=False, psp_weight=False,
        clipocr_all=False, use_memory=False, memory_num=8, fix=False,
        deepsup_scale=0.4, st_weight=0.1, allsup=False, allsup_scale=0.3,
        linear_combine=False, distsoftmax=False, distnearest=False,
        temp=3.0, max_distances=[10], vc_clip_num=4, cropsize=48,
        streaming=False)
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)
