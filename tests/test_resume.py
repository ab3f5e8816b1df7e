"""--resume restores the latest checkpoint and continues from its epoch."""

import argparse

import pytest

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw


def test_frame_trainer_resume(tmp_path):
    root = str(tmp_path / "vspw")
    make_synthetic_vspw(root, 1, 8, (40, 40), 5, seed=17)
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 512
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.TRAIN.epoch_iters = 2
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False

    def args(total, resume):
        return argparse.Namespace(
            dataroot=root, trainfps=15, cropsize=32, multi_scale=False,
            lesslabel=False, train_filter=False, batchsize=2, lr=0.01,
            totalepoch=total, num_class=5, weight_decay=1e-4, workers=0,
            saveroot="", use_clipdataset=False, usetwodata=False,
            resume=resume)

    from cvpr2021_vspw_implement_tpu.train import train
    s1 = train(cfg, args(1, False))
    steps1 = int(s1.step)
    # resume: starts at epoch 1, trains one more epoch
    s2 = train(cfg, args(2, True))
    assert int(s2.step) > steps1
