"""MobileNetV2 weight-importer parity vs the reference torch model
(with the MobileNetV2Dilated surgery applied on both sides)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_mobilenetv2_dilated_parity():
    if "models" not in sys.modules or not getattr(
            sys.modules.get("models"), "__graft_stub__", False):
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF, "models")]
        pkg.__graft_stub__ = True
        sys.modules["models"] = pkg
    spec = importlib.util.spec_from_file_location(
        "models.mobilenet", os.path.join(REF, "models", "mobilenet.py"))
    ref_mob = importlib.util.module_from_spec(spec)
    sys.modules["models.mobilenet"] = ref_mob
    spec.loader.exec_module(ref_mob)

    torch.manual_seed(0)
    orig = ref_mob.mobilenetv2(pretrained=False)
    sd = {k: v.clone() for k, v in orig.state_dict().items()}

    # replicate MobileNetV2Dilated surgery (models/models.py:770-801)
    features = orig.features[:-1]
    down_idx = [2, 4, 7, 14]

    def surgery(dilate):
        def fn(m):
            if m.__class__.__name__.find("Conv") != -1:
                if m.stride == (2, 2):
                    m.stride = (1, 1)
                    if m.kernel_size == (3, 3):
                        m.dilation = (dilate // 2, dilate // 2)
                        m.padding = (dilate // 2, dilate // 2)
                elif m.kernel_size == (3, 3):
                    m.dilation = (dilate, dilate)
                    m.padding = (dilate, dilate)
        return fn

    for i in range(down_idx[-2], down_idx[-1]):
        features[i].apply(surgery(2))
    for i in range(down_idx[-1], len(features)):
        features[i].apply(surgery(4))
    features.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3), np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ref_feats = []
        for i in range(len(features)):
            t = features[i](t)
            if i in down_idx:
                ref_feats.append(t)
        ref_feats.append(t)

    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_mobilenet_state_dict)
    from cvpr2021_vspw_implement_tpu.models.mobilenet import MobileNetV2Dilated

    variables = jax.tree_util.tree_map(
        jnp.asarray, import_mobilenet_state_dict(sd))
    model = MobileNetV2Dilated(dilate_scale=8)
    feats = model.apply(variables, jnp.asarray(x), train=False)
    assert len(feats) == len(ref_feats)
    for ours, theirs in zip(feats, ref_feats):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)
