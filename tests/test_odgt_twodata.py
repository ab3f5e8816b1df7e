"""Legacy odgt dataset + two-domain training-path tests."""

import argparse
import json
import os

import numpy as np
import pytest
from PIL import Image

from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
from cvpr2021_vspw_implement_tpu.data.odgt import OdgtDataset


@pytest.fixture()
def odgt_root(tmp_path):
    rng = np.random.default_rng(0)
    records = []
    for i in range(3):
        img = rng.integers(0, 255, (37, 51, 3), np.uint8)
        segm = rng.integers(0, 6, (37, 51), np.uint8)
        Image.fromarray(img).save(tmp_path / f"img{i}.jpg")
        Image.fromarray(segm).save(tmp_path / f"seg{i}.png")
        records.append({"fpath_img": f"img{i}.jpg", "fpath_segm": f"seg{i}.png",
                        "width": 51, "height": 37})
    odgt = tmp_path / "train.odgt"
    with open(odgt, "w") as f:
        f.write("\n".join(json.dumps(r) for r in records))
    return str(tmp_path), str(odgt)


def test_odgt_train_item(odgt_root):
    root, odgt = odgt_root
    opt = argparse.Namespace(imgSizes=(40, 48), imgMaxSize=100,
                             padding_constant=8, segm_downsampling_rate=4,
                             random_flip=True)
    ds = OdgtDataset(root, odgt, opt, "train", seed=0)
    img, lab = ds[0]
    assert img.shape[0] % 8 == 0 and img.shape[1] % 8 == 0
    assert lab.shape == (img.shape[0] // 4, img.shape[1] // 4)
    assert lab.min() >= -1


def test_odgt_val_item(odgt_root):
    root, odgt = odgt_root
    opt = argparse.Namespace(imgSizes=(40,), imgMaxSize=100,
                             padding_constant=8, segm_downsampling_rate=4)
    ds = OdgtDataset(root, odgt, opt, "val", seed=0)
    img, lab = ds[0]
    assert img.shape[:2] == lab.shape


def test_twodata_training_path(tmp_path):
    root1 = str(tmp_path / "a")
    root2 = str(tmp_path / "b")
    make_synthetic_vspw(root1, 1, 8, (40, 40), 5, seed=1)
    make_synthetic_vspw(root2, 1, 8, (40, 40), 5, seed=2)

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.train import train
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 512
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.TRAIN.epoch_iters = 2
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    args = argparse.Namespace(
        dataroot=root1, dataroot2=root2, usetwodata=True,
        use_clipdataset=False, trainfps=15, cropsize=32, multi_scale=False,
        lesslabel=False, train_filter=False, batchsize=2, lr=0.01,
        totalepoch=1, num_class=5, weight_decay=1e-4, workers=0, saveroot="")
    state = train(cfg, args, max_steps=2)
    assert int(state.step) == 2
