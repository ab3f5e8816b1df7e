"""End-to-end: the eval driver loads reference-format torch encoder
checkpoints via --torch_enc."""

import argparse
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_eval_driver_with_torch_encoder(tmp_path):
    # build a reference-format encoder checkpoint (random weights)
    if "models" not in sys.modules or not getattr(
            sys.modules.get("models"), "__graft_stub__", False):
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF, "models")]
        pkg.__graft_stub__ = True
        sys.modules["models"] = pkg
    spec = importlib.util.spec_from_file_location(
        "models.resnet", os.path.join(REF, "models", "resnet.py"))
    ref_resnet = importlib.util.module_from_spec(spec)
    sys.modules["models.resnet"] = ref_resnet
    spec.loader.exec_module(ref_resnet)
    torch.manual_seed(0)
    enc = ref_resnet.resnet18(pretrained=False)
    ckpt = tmp_path / "encoder_epoch_1.pth"
    torch.save(enc.state_dict(), str(ckpt))

    from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg
    from cvpr2021_vspw_implement_tpu.data import make_synthetic_vspw
    from cvpr2021_vspw_implement_tpu.test import evaluate

    root = str(tmp_path / "vspw")
    make_synthetic_vspw(root, 1, 4, (40, 48), 5, seed=21)
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    args = argparse.Namespace(dataroot=root, split="val", num_class=5,
                              load="", torch_enc=str(ckpt), torch_dec="",
                              saveroot="", lesslabel=False, use_720p=False)
    metrics, _ = evaluate(cfg, args, max_videos=1)
    assert 0.0 <= metrics["mIoU"] <= 1.0
