"""Fused Clip_PSP checkpoint importer: every imported leaf must land on an
existing slot of our ClipPSP tree with a matching shape (structural
compatibility with the reference's saved fused model)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

REF = "/root/reference"
FC, K = 512, 7


def _ref_resnet18():
    if "models" not in sys.modules or not getattr(
            sys.modules.get("models"), "__graft_stub__", False):
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF, "models")]
        pkg.__graft_stub__ = True
        sys.modules["models"] = pkg
    spec = importlib.util.spec_from_file_location(
        "models.resnet", os.path.join(REF, "models", "resnet.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["models.resnet"] = mod
    spec.loader.exec_module(mod)
    return mod.resnet18(pretrained=False)


def _fused_state_dict():
    """Assemble a state_dict with the reference Clip_PSP key layout
    (clip_psp.py:63-92) on a resnet18 encoder."""
    torch.manual_seed(0)
    sd = {}
    enc = _ref_resnet18()
    for k, v in enc.state_dict().items():
        if k.startswith(("fc", "avgpool")):
            continue
        sd[f"encoder.{k}"] = v
    for i in range(4):
        sd[f"ppm_conv.ppm.{i}.0.weight"] = torch.randn(512, FC, 1, 1)
        sd[f"ppm_conv.ppm.{i}.1.weight"] = torch.randn(512)
        sd[f"ppm_conv.ppm.{i}.1.bias"] = torch.randn(512)
        sd[f"ppm_conv.ppm.{i}.1.running_mean"] = torch.randn(512)
        sd[f"ppm_conv.ppm.{i}.1.running_var"] = torch.rand(512) + 0.5
    sd["ppm_conv.conv_last_.0.weight"] = torch.randn(512, FC + 4 * 512, 3, 3)
    sd["ppm_conv.conv_last_.1.weight"] = torch.randn(512)
    sd["ppm_conv.conv_last_.1.bias"] = torch.randn(512)
    sd["ppm_conv.conv_last_.1.running_mean"] = torch.randn(512)
    sd["ppm_conv.conv_last_.1.running_var"] = torch.rand(512) + 0.5
    sd["ppm_conv.conv_last_.4.weight"] = torch.randn(K, 512, 1, 1)
    sd["ppm_conv.conv_last_.4.bias"] = torch.randn(K)
    sd["deepsup.0.weight"] = torch.randn(FC // 4, FC // 2, 3, 3)
    sd["deepsup.1.weight"] = torch.randn(FC // 4)
    sd["deepsup.1.bias"] = torch.randn(FC // 4)
    sd["deepsup.1.running_mean"] = torch.randn(FC // 4)
    sd["deepsup.1.running_var"] = torch.rand(FC // 4) + 0.5
    sd["deepsup.4.weight"] = torch.randn(K, FC // 4, 1, 1)
    sd["deepsup.4.bias"] = torch.randn(K)
    return sd


def _paths(tree, pre=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, pre + k + "/"))
        else:
            out[pre + k] = tuple(np.shape(v))
    return out


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_clip_psp_fused_import_structurally_complete():
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_clip_psp_state_dict)

    imported = import_clip_psp_state_dict(_fused_state_dict())

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipPSP(encoder=enc, num_class=K, fc_dim=FC)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key},
                           jnp.zeros((3, 1, 32, 32, 3)), train=True))

    for coll in ("params", "batch_stats"):
        want = _paths(variables[coll])
        have = _paths(imported[coll])
        missing_slots = set(have) - set(want)
        assert not missing_slots, f"imported keys without a slot: {sorted(missing_slots)[:6]}"
        # every model slot must be covered by the import
        uncovered = set(want) - set(have)
        assert not uncovered, f"model slots not imported: {sorted(uncovered)[:6]}"
        for p in want:
            assert want[p] == have[p], f"shape mismatch at {p}: {want[p]} vs {have[p]}"
