"""Integration smoke: the clip training driver runs one step for each
temporal-method family through the registry (cfg → dataset → collate →
jitted step)."""

import argparse

import pytest

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw


@pytest.fixture(scope="module")
def vspw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vspw_methods")
    make_synthetic_vspw(str(root), num_videos=2, frames_per_video=12,
                        size=(40, 40), num_class=5, seed=9)
    return str(root)


def _args(root, tmpdir, method, clip_num, dilation2="1,2,3"):
    return argparse.Namespace(
        dataroot=root, trainfps=15, cropsize=32, multi_scale=False,
        lesslabel=False, batchsize=1, lr=0.01, totalepoch=1, num_class=5,
        weight_decay=1e-4, workers=0, saveroot=str(tmpdir), method=method,
        clip_num=clip_num, dilation_num=0, dilation2=dilation2, fix=False,
        resume_epoch=0, deepsup_scale=0.4, psp_weight=False,
        clipocr_all=False, use_memory=False, memory_num=8, st_weight=0.1,
        allsup=True, allsup_scale=0.3, linear_combine=False,
        distsoftmax=False, distnearest=False, temp=3.0, max_distances=[2])


@pytest.mark.parametrize("method,clip_num", [
    ("ETC", 2), ("our_warp", 3), ("propnet", 3), ("our_warp_merge", 3),
    ("nonlocal3d", 3), ("tdnet", 4),
])
def test_train_clip_driver_one_step(vspw_root, tmp_path, method, clip_num):
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 512
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.TRAIN.disp_iter = 1
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False

    args = _args(vspw_root, tmp_path, method, clip_num)
    from cvpr2021_vspw_implement_tpu.train_clip import train_clip
    state = train_clip(cfg, args, max_steps=1)
    assert int(state.step) == 1
