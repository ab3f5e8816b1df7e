"""HRNetV2 weight-importer parity vs the reference torch model."""

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


def _load_ref_module(name: str, path: str):
    if "models" not in sys.modules or not getattr(
            sys.modules.get("models"), "__graft_stub__", False):
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF, "models")]
        pkg.__graft_stub__ = True
        sys.modules["models"] = pkg
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_hrnetv2_parity_with_reference():
    ref_hrnet = _load_ref_module("models.hrnet",
                                 os.path.join(REF, "models", "hrnet.py"))
    torch.manual_seed(0)
    tmodel = ref_hrnet.HRNetV2(n_class=1000)
    tmodel.eval()
    # non-trivial running stats
    for m in tmodel.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.data.normal_(0, 0.3)
            m.running_var.data.uniform_(0.6, 1.4)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3), np.float32)
    with torch.no_grad():
        (ref_out,) = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            return_feature_maps=True)

    from cvpr2021_vspw_implement_tpu.models.hrnet import HRNetV2
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_hrnet_state_dict)

    variables = jax.tree_util.tree_map(
        jnp.asarray, import_hrnet_state_dict(tmodel.state_dict()))
    model = HRNetV2()
    (ours,) = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref_out.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-3)
