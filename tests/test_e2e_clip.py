"""End-to-end smoke for the temporal pipeline: train clip_psp on synthetic
videos, then run the clip eval driver (mIoU + VC + memory-enabled clip_ocr)."""

import argparse

import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw


@pytest.fixture(scope="module")
def vspw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vspw_clip")
    make_synthetic_vspw(str(root), num_videos=2, frames_per_video=14,
                        size=(40, 48), num_class=5, seed=7)
    return str(root)


def _clip_args(root, tmpdir, method="clip_psp", **kw):
    ns = argparse.Namespace(
        dataroot=root, trainfps=15, cropsize=40, multi_scale=False,
        lesslabel=False, batchsize=2, lr=0.01, totalepoch=1, num_class=5,
        weight_decay=1e-4, workers=0, saveroot=str(tmpdir), method=method,
        clip_num=4, dilation_num=0, dilation2="1,2,3", fix=False,
        resume_epoch=0, deepsup_scale=0.4, psp_weight=False,
        clipocr_all=False, use_memory=False, memory_num=8, st_weight=0.1,
        allsup=False, allsup_scale=0.3, linear_combine=False,
        distsoftmax=False, distnearest=False, temp=3.0, max_distances=[10],
        vc_clip_num=4, split="val", load="", is_save=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _cfg(tmp_path, enc="resnet18dilated", dec="ppm_deepsup_clip"):
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = enc
    cfg.MODEL.arch_decoder = dec
    cfg.MODEL.fc_dim = 512
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.TRAIN.disp_iter = 1
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    return cfg


def test_train_clip_psp_then_eval(vspw_root, tmp_path):
    cfg = _cfg(tmp_path)
    args = _clip_args(vspw_root, tmp_path)

    from cvpr2021_vspw_implement_tpu.train_clip import train_clip
    state = train_clip(cfg, args, max_steps=2)

    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    metrics, vmiou = evaluate_clip(cfg, args, variables=variables,
                                   max_videos=1)
    assert 0.0 <= metrics["mIoU"] <= 1.0
    assert np.isfinite(metrics["VC"])
    assert len(vmiou) == 1


def test_eval_clip_ocr_with_memory(vspw_root, tmp_path):
    cfg = _cfg(tmp_path, dec="ocrnet_deepsup")
    args = _clip_args(vspw_root, tmp_path, method="clip_ocr",
                      use_memory=True, memory_num=4)
    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip
    metrics, _ = evaluate_clip(cfg, args, max_videos=1)
    assert 0.0 <= metrics["mIoU"] <= 1.0
