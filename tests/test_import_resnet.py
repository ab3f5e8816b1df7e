"""ResNet weight-importer parity: random torch reference weights → our
flax ResNet must produce the same feature pyramid (per-pixel fidelity for
the ImageNet-pretrained encoder checkpoints)."""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("dilated", [False, True])
def test_resnet18_parity_with_reference(dilated):
    # import the reference resnet module WITHOUT executing models/__init__
    # (which needs torchvision, absent here): register a bare namespace
    # package pointing at the reference models dir
    import importlib.util
    import types
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
    orig = ref_resnet.resnet18(pretrained=False)
    sd = {k: v.clone() for k, v in orig.state_dict().items()}

    if dilated:
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
        orig.layer3.apply(surgery(2))
        orig.layer4.apply(surgery(4))
    orig.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3), np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t = orig.relu1(orig.bn1(orig.conv1(t)))
        t = orig.relu2(orig.bn2(orig.conv2(t)))
        t = orig.relu3(orig.bn3(orig.conv3(t)))
        t = orig.maxpool(t)
        ref_feats = []
        for layer in (orig.layer1, orig.layer2, orig.layer3, orig.layer4):
            t = layer(t)
            ref_feats.append(t)

    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_resnet_state_dict)
    from cvpr2021_vspw_implement_tpu.models.resnet import resnet18

    variables = jax.tree_util.tree_map(
        jnp.asarray, import_resnet_state_dict(sd))
    model = resnet18(dilate_scale=8 if dilated else None)
    feats = model.apply(variables, jnp.asarray(x), train=False)

    assert len(feats) == len(ref_feats)
    for ours, theirs in zip(feats, ref_feats):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)
