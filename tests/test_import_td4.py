"""TD4 path-encoder importer: covers all four encoder subtrees exactly."""

import importlib.util
import os
import sys
import types

import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_td4_encoder_import_structural():
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
    torch.manual_seed(0)
    sd = mod.resnet18(pretrained=False).state_dict()

    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_td4_encoders)
    from cvpr2021_vspw_implement_tpu.models.td4_psp import TD4PSP

    imported = import_td4_encoders(sd)
    model = TD4PSP(num_class=5, cropsize=32)
    key = jax.random.PRNGKey(0)
    var = jax.eval_shape(lambda: model.init(
        {"params": key, "dropout": key}, jnp.zeros((4, 1, 32, 32, 3)),
        train=True))

    def paths(t, p=""):
        out = set()
        for k, v in t.items():
            out |= paths(v, p + k + "/") if isinstance(v, dict) else {p + k}
        return out

    for coll in ("params", "batch_stats"):
        want = {p for p in paths(var[coll]) if p.startswith("paths_")}
        have = paths(imported[coll])
        assert have == want
