"""--resume restores the latest checkpoint and continues from its epoch."""

import argparse

import jax
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


def test_frame_trainer_midepoch_preemption_exact(tmp_path):
    """Kill the trainer mid-epoch, restore, and the resumed run's final
    state equals the uninterrupted run's EXACTLY — optimizer state, LR
    schedule position (both live in state.step), per-epoch shuffled data
    order (loader.epoch realignment) and the step-folded dropout RNG all
    continue step for step.  Beats the reference's manual epoch-granular
    --resume_epoch (train_clip2.py:347-357)."""
    import numpy as np

    from cvpr2021_vspw_implement_tpu.utils import checkpoint as ckpt_mod

    root = str(tmp_path / "vspw")
    make_synthetic_vspw(root, 1, 8, (40, 40), 5, seed=23)

    def make_cfg(sub):
        cfg = default_cfg.clone()
        cfg.MODEL.arch_encoder = "resnet18dilated"
        cfg.MODEL.arch_decoder = "c1"
        cfg.MODEL.fc_dim = 512
        cfg.DIR = str(tmp_path / sub)
        cfg.TRAIN.epoch_iters = 4
        cfg.TPU.compute_dtype = "float32"
        cfg.TPU.remat = False
        return cfg

    def args(total, resume):
        return argparse.Namespace(
            dataroot=root, trainfps=15, cropsize=32, multi_scale=False,
            lesslabel=False, train_filter=False, batchsize=2, lr=0.01,
            totalepoch=total, num_class=5, weight_decay=1e-4, workers=0,
            saveroot="", use_clipdataset=False, usetwodata=False,
            resume=resume)

    from cvpr2021_vspw_implement_tpu.train import train

    # uninterrupted: 2 epochs x 4 steps
    ref = train(make_cfg("ref"), args(2, False))

    # preempted at step 6 (mid-epoch 1), then resumed
    class FakePreempt:
        def __init__(self, ckpt_dir, prefix="preempt_"):
            self.ckpt_dir, self.prefix, self.calls = ckpt_dir, prefix, 0

        @property
        def requested(self):
            self.calls += 1
            return self.calls >= 6

        def maybe_save(self, state, step):
            return ckpt_mod.save_checkpoint(self.ckpt_dir, state, step,
                                            prefix=self.prefix)

    real = ckpt_mod.PreemptionCheckpointer
    ckpt_mod.PreemptionCheckpointer = FakePreempt
    try:
        killed = train(make_cfg("pre"), args(2, False))
    finally:
        ckpt_mod.PreemptionCheckpointer = real
    assert int(killed.step) == 6

    resumed = train(make_cfg("pre"), args(2, True))
    assert int(resumed.step) == int(ref.step) == 8

    ref_leaves = jax.tree_util.tree_leaves(
        {"p": ref.params, "b": ref.batch_stats, "o": ref.opt_state})
    res_leaves = jax.tree_util.tree_leaves(
        {"p": resumed.params, "b": resumed.batch_stats,
         "o": resumed.opt_state})
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0, rtol=0)
