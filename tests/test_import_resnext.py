"""ResNeXt-101 weight-importer parity: random torch reference weights →
our flax resnext101 must produce the same [C2..C5] feature pyramid.

The reference builds resnext101 only undilated (models/models.py:559-561
wraps it in plain ``Resnet``, never ``ResnetDilated``), so parity is
checked at output-stride 32.  Reference module: models/resnext.py:23-154
(GroupBottleneck expansion=2, groups=32, stage widths 128/256/512/1024).
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _load_ref_module(name):
    import importlib.util
    import types
    if "models" not in sys.modules or not getattr(
            sys.modules.get("models"), "__graft_stub__", False):
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF, "models")]
        pkg.__graft_stub__ = True
        sys.modules["models"] = pkg
    spec = importlib.util.spec_from_file_location(
        f"models.{name}", os.path.join(REF, "models", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"models.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_resnext101_parity_with_reference():
    ref_resnext = _load_ref_module("resnext")

    torch.manual_seed(0)
    orig = ref_resnext.resnext101(pretrained=False)
    # At init every BN has identity running stats, so with kaiming weights
    # activations grow multiplicatively over the 33 blocks (~1e5 by layer4)
    # and f32 rounding amplifies to percent level.  Contract the random conv
    # weights to keep activations O(1) — parity of the *structure* (grouped
    # convs, expansion-2 widths, downsample wiring) is what's under test.
    with torch.no_grad():
        for m in orig.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.mul_(0.2)
    sd = {k: v.clone() for k, v in orig.state_dict().items()}
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
    from cvpr2021_vspw_implement_tpu.models.resnet import resnext101

    variables = jax.tree_util.tree_map(
        jnp.asarray, import_resnet_state_dict(sd))
    model = resnext101()
    feats = model.apply(variables, jnp.asarray(x), train=False)

    assert len(feats) == len(ref_feats)
    for ours, theirs in zip(feats, ref_feats):
        assert ours.shape == tuple(
            theirs.shape[i] for i in (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_resnext101_channel_widths():
    """The pyramid widths the decoders consume: expansion-2 blocks on
    doubled stage planes give the same 256/512/1024/2048 progression as
    resnet101 (reference: models/resnext.py:63-82)."""
    from cvpr2021_vspw_implement_tpu.models.resnet import resnext101
    model = resnext101()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    feats = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]
