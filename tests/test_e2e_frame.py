"""End-to-end smoke: train a small per-frame model on synthetic VSPW data,
then evaluate mIoU with the eval driver — exercising config, data, model,
train step, checkpointing and metrics together."""

import argparse
import os

import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw


@pytest.fixture(scope="module")
def vspw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vspw_e2e")
    make_synthetic_vspw(str(root), num_videos=2, frames_per_video=16,
                        size=(48, 64), num_class=5, seed=3)
    return str(root)


def _train_args(root, tmpdir):
    return argparse.Namespace(
        dataroot=root, trainfps=15, cropsize=48, multi_scale=False,
        lesslabel=False, train_filter=False, batchsize=4, lr=0.05,
        totalepoch=1, num_class=5, weight_decay=1e-4, workers=0,
        saveroot=str(tmpdir))


def test_train_then_eval(vspw_root, tmp_path):
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup"
    cfg.MODEL.fc_dim = 512
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.TRAIN.epoch_iters = 8
    cfg.TRAIN.disp_iter = 2
    cfg.TPU.compute_dtype = "float32"   # CPU test
    cfg.TPU.remat = False

    args = _train_args(vspw_root, tmp_path)

    from cvpr2021_vspw_implement_tpu.train import train
    state = train(cfg, args, max_steps=6)
    assert os.path.exists(os.path.join(cfg.DIR, "model_epoch_1.msgpack"))

    # eval with the trained variables
    from cvpr2021_vspw_implement_tpu.test import evaluate
    eval_args = argparse.Namespace(
        dataroot=vspw_root, split="val", num_class=5, load="",
        saveroot=str(tmp_path / "preds"), lesslabel=False, use_720p=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    metrics, vmiou = evaluate(cfg, eval_args, variables=variables,
                              max_videos=1, is_save=True)
    assert 0.0 <= metrics["mIoU"] <= 1.0
    assert np.isfinite(metrics["Acc"])
    assert len(vmiou) == 1
    # PNG dump written with palette
    import glob
    pngs = glob.glob(str(tmp_path / "preds" / "*" / "*.png"))
    assert len(pngs) == 16


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from cvpr2021_vspw_implement_tpu.utils.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint)

    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.int32(7)}
    p1 = save_checkpoint(str(tmp_path), state, 1)
    save_checkpoint(str(tmp_path), state, 3)
    assert latest_checkpoint(str(tmp_path)).endswith("model_epoch_3.msgpack")
    restored = load_checkpoint(p1, state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  [0, 1, 2, 3])
