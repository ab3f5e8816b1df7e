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


FRAME_COMBOS = [
    # (arch_encoder, fc_dim, arch_decoder) — the reference test.py surface
    # (models.py:530-646 build_encoder/build_decoder enums)
    ("resnet18dilated", 512, "ppm"),
    ("resnet18dilated", 512, "c1_deepsup"),
    ("resnet50dilated", 2048, "upernet"),
    ("resnet50dilated", 2048, "upernet_lite"),
    ("resnet50dilated", 2048, "deeplab"),
    ("resnet50dilated", 2048, "ocrnet_deepsup"),
    ("resnet50dilated", 2048, "nonlocal2d"),
    ("mobilenetv2dilated", 320, "c1"),
    ("hrnetv2", 720, "c1"),
    ("resnext101", 2048, "ppm_deepsup"),
]


@pytest.mark.parametrize("enc_arch,fc_dim,dec_arch", FRAME_COMBOS,
                         ids=[f"{e}-{d}" for e, _, d in FRAME_COMBOS])
def test_golden_frame_eval_matrix(tmp_path, enc_arch, fc_dim, dec_arch):
    """Whole-pipeline golden equality across the frame eval surface: every
    reference encoder×decoder family test.py can evaluate (models.py
    build_encoder/build_decoder) produces pixel-identical masks through
    our CLI from the same torch checkpoints."""
    root = _fixture(tmp_path, seed=60 + hash((enc_arch, dec_arch)) % 100)
    video = "video_000"

    mm = _ref_import("models.models")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")
    rutils = _load_ref_toplevel("utils.py", "ref_utils")

    torch.manual_seed(12)
    enc = mm.ModelBuilder.build_encoder(enc_arch, fc_dim=fc_dim, weights="")
    dec = mm.ModelBuilder.build_decoder(dec_arch, fc_dim=fc_dim,
                                        num_class=K, use_softmax=True)
    seg = mm.SegmentationModule(enc, dec, torch.nn.NLLLoss(ignore_index=-1))
    _randomize(seg, seed=53)
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

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test import evaluate

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = enc_arch
    cfg.MODEL.arch_decoder = dec_arch
    cfg.MODEL.fc_dim = fc_dim
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


def _clip_args(root, saveroot, method, fused_ckpt, **over):
    """Full evaluate_clip arg surface with golden-test defaults."""
    base = dict(
        dataroot=root, split="val", num_class=K, method=method,
        clip_num=4, dilation_num=0, dilation2="1,2,3", load="",
        torch_load=fused_ckpt, saveroot=saveroot, is_save=True,
        lesslabel=False, use_720p=False, psp_weight=False,
        clipocr_all=False, use_memory=False, memory_num=8, fix=False,
        deepsup_scale=0.4, st_weight=0.1, allsup=False, allsup_scale=0.3,
        linear_combine=False, distsoftmax=False, distnearest=False,
        temp=3.0, max_distances=[10], vc_clip_num=4, cropsize=48,
        streaming=False)
    base.update(over)
    return argparse.Namespace(**base)


def _ref_eval_loop(tmodel, ds, num_class, feed_extra=None):
    """The reference per-video eval loop (test_clip2.py:28-89): window
    forward, argmax, Evaluator accumulation, prediction dict."""
    rutils = _load_ref_toplevel("utils.py", "ref_utils")
    ev = rutils.Evaluator(num_class)
    ev.reset()
    preds = {}
    for i in range(len(ds)):
        img, gt, clip_imgs, _lbls, gtname = ds[i]
        feed = {"img_data": img[None], "seg_label": gt[None],
                "clipimgs_data": [c[None] for c in clip_imgs]}
        if feed_extra:
            feed.update(feed_extra(i))
        with torch.no_grad():
            scores = tmodel(feed, segSize=img.shape[-2:])
        pred = torch.argmax(scores, dim=1).numpy()[0]
        ev.add_batch(gt.squeeze(0).numpy()[None], pred[None])
        preds[gtname.split(".")[0] + ".png"] = pred.astype(np.uint8)
    return ev.Mean_Intersection_over_Union(), preds


@pytest.mark.parametrize("streaming", [False, True])
def test_golden_clip_eval_clip_ocr(tmp_path, streaming):
    """TCB-OCR: reference window pipeline vs our CLI (both the window loop
    and the production ClipOCRStreamer serving path) — pixel-identical."""
    root = _fixture(tmp_path, seed=33)
    video = "video_000"

    mm = _ref_import("models.models")
    ref_clip_ocr = _ref_import("models.clip_ocr")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")

    margs = argparse.Namespace(num_class=K, use_memory=False,
                               clipocr_all=False, clip_num=4,
                               dilation2="1,2,3", lesslabel=False,
                               use_720p=False)
    torch.manual_seed(2)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    tmodel = ref_clip_ocr.ClipOCRNet(enc, torch.nn.NLLLoss(ignore_index=255),
                                     margs, deep_sup_scale=0.4)
    _randomize(tmodel, seed=43)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    ds = ds2.TestDataset_longclip(root, video, margs)
    ref_miou, ref_preds = _ref_eval_loop(tmodel, ds, K)

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 2048
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = _clip_args(root, saveroot, "clip_ocr", fused_ckpt,
                      streaming=streaming)
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)


def test_golden_clip_eval_clip_ocr_memory(tmp_path):
    """TCB-OCR with the cross-frame memory ring (--use_memory): the
    reference keeps a stateful list of detached OCR contexts on the module
    (clip_ocr.py:124-128, spatial_ocr_block.py:96-126; the eval loop sets
    is_clean_memory on each video's first frame, test_clip2.py:46-51).
    memory_num=3 over an 8-frame video exercises the ring's pop path.
    Oracle vs our CLI's functional memory carry — pixel-identical."""
    root = _fixture(tmp_path, seed=43)
    video = "video_000"

    mm = _ref_import("models.models")
    ref_clip_ocr = _ref_import("models.clip_ocr")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")

    margs = argparse.Namespace(num_class=K, use_memory=True, memory_num=3,
                               clipocr_all=False, clip_num=4,
                               dilation2="1,2,3", lesslabel=False,
                               use_720p=False)
    torch.manual_seed(13)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    tmodel = ref_clip_ocr.ClipOCRNet(enc, torch.nn.NLLLoss(ignore_index=255),
                                     margs, deep_sup_scale=0.4)
    _randomize(tmodel, seed=54)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    ds = ds2.TestDataset_longclip(root, video, margs)
    ref_miou, ref_preds = _ref_eval_loop(
        tmodel, ds, K, feed_extra=lambda i: {"is_clean_memory": i == 0})

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 2048
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = _clip_args(root, saveroot, "clip_ocr", fused_ckpt,
                      use_memory=True, memory_num=3)
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)


def test_golden_clip_eval_etc(tmp_path, monkeypatch):
    """ETC: inference is single-frame (reference ETC.py:181-189); the
    reference pipeline over TestDataset_clip vs our window-loop CLI."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_fused_numeric import _stage_raft_ckpt

    root = _fixture(tmp_path, seed=34)
    video = "video_000"

    _stage_raft_ckpt(tmp_path, monkeypatch)
    mm = _ref_import("models.models")
    ref_etc = _ref_import("models.ETC")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")

    margs = argparse.Namespace(num_class=K, clip_num=2, dilation_num=0,
                               st_weight=0.1, method="ETC", lesslabel=False,
                               use_720p=False)
    torch.manual_seed(3)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=2048,
                                        num_class=K, use_softmax=True)
    tmodel = ref_etc.ETC(enc, dec, torch.nn.NLLLoss(ignore_index=-1),
                         margs, deep_sup_scale=0.4)
    _randomize(tmodel, seed=44)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    ds = ds2.TestDataset_clip(root, video, margs)
    ref_miou, ref_preds = _ref_eval_loop(tmodel, ds, K)

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 2048
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = _clip_args(root, saveroot, "ETC", fused_ckpt, clip_num=2)
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)


def test_golden_clip_eval_netwarp(tmp_path, monkeypatch):
    """NetWarp: reference RAFT-coupled window pipeline vs our production
    NetWarpStreamer CLI path.  128x128 frames (the torch RAFT corr pyramid
    needs H/64 >= 2, fused-numeric note)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_fused_numeric import _stage_raft_ckpt

    from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
    root = str(tmp_path / "vspw")
    make_synthetic_vspw(root, 1, 5, (128, 128), K, seed=35)
    video = "video_000"

    _stage_raft_ckpt(tmp_path, monkeypatch)
    mm = _ref_import("models.models")
    ref_nw = _ref_import("models.netwarp")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")

    margs = argparse.Namespace(num_class=K, clip_num=2, dilation_num=0,
                               method="netwarp", lesslabel=False,
                               use_720p=False)
    torch.manual_seed(4)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=2048,
                                        num_class=K, use_softmax=True)
    tmodel = ref_nw.NetWarp(enc, dec, torch.nn.NLLLoss(ignore_index=-1),
                            margs, deep_sup_scale=0.4)
    _randomize(tmodel, seed=45)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    ds = ds2.TestDataset_clip(root, video, margs)
    ref_miou, ref_preds = _ref_eval_loop(tmodel, ds, K)

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 2048
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = _clip_args(root, saveroot, "netwarp", fused_ckpt, clip_num=2,
                      streaming=True)
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)


def test_golden_clip_eval_netwarp_ocr(tmp_path, monkeypatch):
    """NetWarp-OCR: reference RAFT-coupled window pipeline (netwarp_ocr.py
    fused module, no separate decoder) vs our production NetWarpStreamer
    CLI path with the OCR head."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_fused_numeric import _stage_raft_ckpt

    from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
    root = str(tmp_path / "vspw")
    make_synthetic_vspw(root, 1, 5, (128, 128), K, seed=37)
    video = "video_000"

    _stage_raft_ckpt(tmp_path, monkeypatch)
    mm = _ref_import("models.models")
    ref_nwo = _ref_import("models.netwarp_ocr")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")

    margs = argparse.Namespace(num_class=K, clip_num=2, dilation_num=0,
                               method="netwarp_ocr", lesslabel=False,
                               use_720p=False)
    torch.manual_seed(6)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    tmodel = ref_nwo.NetWarp_ocr(enc, torch.nn.NLLLoss(ignore_index=-1),
                                 margs, deep_sup_scale=0.4)
    _randomize(tmodel, seed=47)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    ds = ds2.TestDataset_clip(root, video, margs)
    ref_miou, ref_preds = _ref_eval_loop(tmodel, ds, K)

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 2048
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = _clip_args(root, saveroot, "netwarp_ocr", fused_ckpt, clip_num=2,
                      streaming=True)
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)


def test_golden_clip_eval_etc_ocr(tmp_path, monkeypatch):
    """ETC-OCR: single-frame inference (ETC_ocr.py fused module) through
    the reference window pipeline vs our window-loop CLI."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_fused_numeric import _stage_raft_ckpt

    root = _fixture(tmp_path, seed=38)
    video = "video_000"

    _stage_raft_ckpt(tmp_path, monkeypatch)
    mm = _ref_import("models.models")
    ref_eo = _ref_import("models.ETC_ocr")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")

    margs = argparse.Namespace(num_class=K, clip_num=2, dilation_num=0,
                               st_weight=0.1, method="etc_ocr",
                               lesslabel=False, use_720p=False)
    torch.manual_seed(7)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    tmodel = ref_eo.ETC_ocr(enc, torch.nn.NLLLoss(ignore_index=-1),
                            margs, deep_sup_scale=0.4)
    _randomize(tmodel, seed=48)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    ds = ds2.TestDataset_clip(root, video, margs)
    ref_miou, ref_preds = _ref_eval_loop(tmodel, ds, K)

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 2048
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = _clip_args(root, saveroot, "etc_ocr", fused_ckpt, clip_num=2)
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)


def _warp_family_golden(tmp_path, method, ref_modname, ref_clsname,
                        dec_arch, seed, torch_seed, rand_seed,
                        needs_decoder=True):
    """Shared golden-eval body for the local cost-volume family
    (our_warp / propnet / our_warp_merge; reference test_clip2.py:241-249
    model build + test() loop over TestDataset_clip)."""
    root = _fixture(tmp_path, seed=seed)
    video = "video_000"

    mm = _ref_import("models.models")
    ref_mod = _ref_import(ref_modname)
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")

    margs = argparse.Namespace(
        num_class=K, clip_num=3, dilation_num=0, fix=False,
        max_distances=[2], linear_combine=False, distsoftmax=False,
        distnearest=False, temp=3.0, allsup=False, allsup_scale=1.0,
        method=method, lesslabel=False, use_720p=False)
    torch.manual_seed(torch_seed)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    dec = mm.ModelBuilder.build_decoder(dec_arch, fc_dim=2048,
                                        num_class=K, use_softmax=True)
    tmodel = getattr(ref_mod, ref_clsname)(
        enc, dec, torch.nn.NLLLoss(ignore_index=-1), margs,
        deep_sup_scale=0.4)
    _randomize(tmodel, seed=rand_seed)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    ds = ds2.TestDataset_clip(root, video, margs)
    ref_miou, ref_preds = _ref_eval_loop(tmodel, ds, K)

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = dec_arch
    cfg.MODEL.fc_dim = 2048
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = _clip_args(root, saveroot, method, fused_ckpt, clip_num=3,
                      max_distances=[2])
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)


def test_golden_clip_eval_our_warp(tmp_path):
    """our_warp (ClipWarpNet local cost-volume warp): reference window
    pipeline vs our window-loop CLI — pixel-identical."""
    _warp_family_golden(tmp_path, "our_warp", "models.models",
                        "ClipWarpNet", "ppm_deepsup_clip",
                        seed=39, torch_seed=8, rand_seed=49)


def test_golden_clip_eval_propnet(tmp_path):
    """propnet (class-masked label propagation): reference window pipeline
    vs our window-loop CLI — pixel-identical."""
    _warp_family_golden(tmp_path, "propnet", "models.propnet",
                        "PropNet", "ppm_deepsup_clip",
                        seed=40, torch_seed=9, rand_seed=50)


def test_golden_clip_eval_our_warp_merge(tmp_path):
    """our_warp_merge (first-neighbor merge variant, ppm_clip decoder):
    reference window pipeline vs our window-loop CLI — pixel-identical."""
    _warp_family_golden(tmp_path, "our_warp_merge", "models.warp_our_merge",
                        "OurWarpMerge", "ppm_clip",
                        seed=41, torch_seed=10, rand_seed=51)


def test_golden_clip_eval_nonlocal3d(tmp_path):
    """nonlocal3d: the reference's score-averaging ``test_all`` loop
    (test_clip2.py:90-195 — every frame's softmax scores accumulate over
    the clip_num windows containing it) vs our _test_all_nonlocal3d CLI
    path — pixel-identical masks and mIoU."""
    root = _fixture(tmp_path, seed=42)
    video = "video_000"

    mm = _ref_import("models.models")
    ref_nl = _ref_import("models.non_local_models")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")
    rutils = _load_ref_toplevel("utils.py", "ref_utils")

    margs = argparse.Namespace(num_class=K, clip_num=3, dilation_num=0,
                               method="nonlocal3d", lesslabel=False,
                               use_720p=False)
    torch.manual_seed(11)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    tmodel = ref_nl.Non_local3d(margs, enc, torch.nn.NLLLoss(ignore_index=-1))
    _randomize(tmodel, seed=52)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    # ---- reference test_all loop (batchsize=1) ----------------------------
    ds = ds2.TestDataset_clip(root, video, margs)
    ev = rutils.Evaluator(K)
    ev.reset()
    gt_dic, pred_dic, done, ref_preds = {}, {}, set(), {}

    def _flush(nn):
        tmp = torch.cat(pred_dic.pop(nn), dim=0).mean(dim=0, keepdim=True)
        pred = torch.argmax(tmp, dim=1).numpy()[0]
        gt = gt_dic[nn].numpy()[0]
        ev.add_batch(gt[None], pred[None])
        ref_preds[nn.split(".")[0] + ".png"] = pred.astype(np.uint8)
        done.add(nn)

    with torch.no_grad():
        for i in range(len(ds)):
            img, gt, clips, cliplabs, names = ds[i]
            h, w = img.shape[-2:]
            feed = {"clipimgs_data": [c[None] for c in clips],
                    "cliplabels_data": [l[None] for l in cliplabs]}
            scores = tmodel(feed, segSize=(h, w))  # list of T [1,K,H,W]
            for t, nn in enumerate(names):
                if nn in done:
                    continue
                gt_dic.setdefault(nn, cliplabs[t])  # [1,H,W]
                pred_dic.setdefault(nn, []).append(scores[t])
                if len(pred_dic[nn]) > margs.clip_num - 1:
                    _flush(nn)
    for nn in list(pred_dic):
        _flush(nn)
    ref_miou = ev.Mean_Intersection_over_Union()

    # ---- our CLI test_all eval, same fused checkpoint ----------------------
    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 2048
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = _clip_args(root, saveroot, "nonlocal3d", fused_ckpt, clip_num=3)
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)


def test_golden_tdnet_eval(tmp_path):
    """TDNet streaming eval: the reference's own streaming branch is
    broken upstream (td4_psp.py:317-330 swaps Encoding's (v, q) return
    into (q, v) AND buffers (k, v, q) as (q, k, v), feeding
    shape-mismatched tensors into LayerNorm — it raises at runtime).  The
    oracle here is the reference's torch modules driven by the INTENDED
    streaming schedule (unpack fixed, logits upsampled to segSize like
    every other method's eval branch), which is exactly what our driver
    implements (models/td4_psp.py module docstring)."""
    from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
    root = str(tmp_path / "vspw")
    hw = 48
    make_synthetic_vspw(root, 1, 8, (hw, hw), K, seed=36)
    video = "video_000"

    ref_td4 = _ref_import("models.td4_psp.td4_psp")
    ds2 = _load_ref_toplevel("dataset2.py", "ref_dataset2")
    rutils = _load_ref_toplevel("utils.py", "ref_utils")

    cropsize = hw - 1  # int(cropsize/8)+1 == hw/8 feature size (curve test)
    margs = argparse.Namespace(num_class=K, cropsize=cropsize, fix=False,
                               clip_num=4, dilation_num=0, method="tdnet",
                               lesslabel=False, use_720p=False)
    torch.manual_seed(5)
    tmodel = ref_td4.td4_psp(args=margs, backbone="resnet18")
    _randomize(tmodel, seed=46)
    tmodel.eval()
    fused_ckpt = str(tmp_path / "model_epoch_1.pth")
    torch.save(tmodel.state_dict(), fused_ckpt)

    # ---- fixed-reference streaming oracle --------------------------------
    pre = [tmodel.pretrained1, tmodel.pretrained2, tmodel.pretrained3,
           tmodel.pretrained4]
    psp = [tmodel.psp1, tmodel.psp2, tmodel.psp3, tmodel.psp4]
    encm = [tmodel.enc1, tmodel.enc2, tmodel.enc3, tmodel.enc4]
    lns = [tmodel.layer_norm1, tmodel.layer_norm2, tmodel.layer_norm3,
           tmodel.layer_norm4]
    heads = [tmodel.head1, tmodel.head2, tmodel.head3, tmodel.head4]
    atn = [[None] * 4 for _ in range(4)]
    for p in range(4):
        for j in range(4):
            if j != p:
                atn[p][j] = getattr(tmodel, f"atn{p + 1}_{j + 1}")

    ds = ds2.TestDataset_clip(root, video, margs)
    ev = rutils.Evaluator(K)
    ev.reset()
    ref_preds = {}
    Kq, Vq, Qq = [], [], []
    with torch.no_grad():
        for i in range(len(ds)):
            img, gt, _clips, _lbls, gtname = ds[i]
            p = i % 4
            z = psp[p](pre[p](img[None], aux=False))
            v_cur, q_cur = encm[p](z, pre=False)    # FIXED unpack order
            if len(Qq) < 3:
                feat = v_cur
            else:
                ctx = [(p + 1) % 4, (p + 2) % 4, (p + 3) % 4]
                a1 = atn[p][ctx[0]](Kq[0], Vq[0], Qq[1], fea_size=None)
                a2 = atn[p][ctx[1]](Kq[1], a1 + Vq[1], Qq[2], fea_size=None)
                att = atn[p][ctx[2]](Kq[2], a2 + Vq[2], q_cur,
                                     fea_size=z.size())
                feat = att + v_cur
            out = heads[p](lns[p](feat))
            out = torch.nn.functional.interpolate(
                out, (hw, hw), mode="bilinear", align_corners=True)
            k_n, v_n, q_n = encm[p](z, pre=True)    # FIXED buffer mapping
            Kq.append(k_n); Vq.append(v_n); Qq.append(q_n)
            if len(Qq) > 3:
                Kq.pop(0); Vq.pop(0); Qq.pop(0)
            pred = torch.argmax(out, dim=1).numpy()[0]
            ev.add_batch(gt.squeeze(0).numpy()[None], pred[None])
            ref_preds[gtname.split(".")[0] + ".png"] = pred.astype(np.uint8)
    ref_miou = ev.Mean_Intersection_over_Union()

    # ---- our CLI streaming eval, same torch checkpoint -------------------
    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    saveroot = str(tmp_path / "preds")
    args = _clip_args(root, saveroot, "tdnet", fused_ckpt,
                      cropsize=cropsize)
    metrics, _ = evaluate_clip(cfg, args, max_videos=1, is_save=True)

    _compare_pred_dirs(ref_preds, saveroot, video)
    np.testing.assert_allclose(metrics["mIoU"], ref_miou, atol=1e-9)
