"""--pre_enc / --pre_dec pretrained init (reference train_clip2.py:465-512).

The reference initializes temporal training from per-frame-pretrained
torch encoder/decoder checkpoints via ModelBuilder weights=; our trainers
import the same .pth files through the arch-dispatched importers before
the first step.
"""

import argparse
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_data import vspw_root  # noqa: E402,F401 (fixture)
from test_fused_numeric import _randomize, _ref_import  # noqa: E402

REF = "/root/reference"
K = 5

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _frame_args(root, tmpdir, **kw):
    base = dict(dataroot=root, num_class=K, batchsize=2, cropsize=48,
                lr=0.01, weight_decay=1e-4, totalepoch=1, trainfps=1,
                multi_scale=False, lesslabel=False, use_720p=False,
                dilation_num=0, validation=False, saveroot=str(tmpdir),
                split="val", is_save=False, pre_enc="", pre_dec="")
    base.update(kw)
    return argparse.Namespace(**base)


def test_pre_enc_pre_dec_frame_trainer(vspw_root, tmp_path):
    mm = _ref_import("models.models")
    torch.manual_seed(0)
    enc = mm.ModelBuilder.build_encoder("resnet18dilated", weights="")
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup", fc_dim=512,
                                        num_class=K, use_softmax=False)
    _randomize(enc, seed=41)
    _randomize(dec, seed=42)
    enc_pth = tmp_path / "encoder_epoch_1.pth"
    dec_pth = tmp_path / "decoder_epoch_1.pth"
    torch.save(enc.state_dict(), str(enc_pth))
    torch.save(dec.state_dict(), str(dec_pth))

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.train import train

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup"
    cfg.MODEL.fc_dim = 512
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.TPU.compute_dtype = "float32"
    cfg.TRAIN.epoch_iters = 1

    args = _frame_args(vspw_root, tmp_path, pre_enc=str(enc_pth),
                       pre_dec=str(dec_pth), totalepoch=0)
    state = train(cfg, args)  # totalepoch=0: init only, no SGD step

    # the torch conv1 stem kernel must be in the initialized params
    want = enc.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(state.params["encoder"]["conv1"]["conv"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # a decoder kernel imported too: compare total element count of all
    # conv kernels (proves the merge ran over the decoder subtree)
    dec_sd = dec.state_dict()
    any_key = next(k for k in dec_sd if k.endswith("weight")
                   and dec_sd[k].dim() == 4)
    wantd = dec_sd[any_key].numpy()
    leaves = jax.tree_util.tree_leaves(state.params["decoder"])
    assert any(l.size == wantd.size for l in leaves)


def test_pre_enc_clip_trainer_no_decoder_subtree(vspw_root, tmp_path):
    """clip_psp has no 'decoder' subtree: --pre_enc applies, --pre_dec is
    ignored gracefully (matches the reference, whose Clip_PSP takes only
    the encoder)."""
    mm = _ref_import("models.models")
    torch.manual_seed(1)
    enc = mm.ModelBuilder.build_encoder("resnet18dilated", weights="")
    _randomize(enc, seed=43)
    enc_pth = tmp_path / "enc.pth"
    torch.save(enc.state_dict(), str(enc_pth))

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.train_clip import train_clip

    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_clip"
    cfg.MODEL.fc_dim = 512
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.TPU.compute_dtype = "float32"

    args = argparse.Namespace(
        dataroot=vspw_root, num_class=K, batchsize=2, cropsize=48, lr=0.01,
        weight_decay=1e-4, totalepoch=1, trainfps=1, multi_scale=False,
        lesslabel=False, dilation_num=0, clip_num=4, dilation2=[1, 2, 3],
        method="clip_psp", fix=False, deepsup_scale=0.4, psp_weight=False,
        resume_epoch=0, saveroot=str(tmp_path), validation=False,
        pre_enc=str(enc_pth), pre_dec=str(enc_pth))  # pre_dec bogus→ignored
    args.totalepoch = 0  # init only, no SGD step
    state = train_clip(cfg, args)

    want = enc.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(state.params["encoder"]["conv1"]["conv"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
