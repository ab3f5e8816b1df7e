"""TDNet streaming eval through the clip eval driver."""

import argparse

import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw


def test_tdnet_streaming_eval(tmp_path):
    root = str(tmp_path / "vspw")
    make_synthetic_vspw(root, num_videos=1, frames_per_video=8,
                        size=(40, 48), num_class=5, seed=13)
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    args = argparse.Namespace(
        dataroot=root, split="val", num_class=5, method="tdnet",
        clip_num=4, dilation_num=0, dilation2="1,2,3", vc_clip_num=4,
        lesslabel=False, use_memory=False, memory_num=8, clipocr_all=False,
        psp_weight=False, deepsup_scale=0.4, st_weight=0.1, allsup=False,
        allsup_scale=0.3, linear_combine=False, distsoftmax=False,
        distnearest=False, temp=3.0, max_distances=[10], load="",
        saveroot="", is_save=False, streaming=False, fix=False,
        cropsize=40, multi_scale=False, trainfps=15)

    from cvpr2021_vspw_implement_tpu.test_clip import evaluate_clip
    metrics, vmiou = evaluate_clip(cfg, args, max_videos=1)
    assert 0.0 <= metrics["mIoU"] <= 1.0
    assert np.isfinite(metrics["VC"])
