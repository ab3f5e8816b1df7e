"""PPM decoder checkpoint importer: a state_dict with the reference's key
layout must load into our decoder and reproduce the torch-oracle output."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
from cvpr2021_vspw_implement_tpu.models.import_torch import (
    import_ppm_decoder_state_dict, merge_variables)
from tests.test_decoder_parity import FC_DIM, NUM_CLASS, TorchPPMDeepsup

KEY = jax.random.PRNGKey(0)


def _reference_named_state_dict(oracle):
    """Re-key the oracle's tensors with the reference decoder names
    (models/models.py:938-963: ppm.{i}.{1,2}, conv_last_.{0,1,4},
    cbr_deepsup.{0,1}, conv_last_deepsup_)."""
    sd = {}
    for i, branch in enumerate(oracle.ppm):
        sd[f"ppm.{i}.1.weight"] = branch[1].weight
        sd[f"ppm.{i}.2.weight"] = branch[2].weight
        sd[f"ppm.{i}.2.bias"] = branch[2].bias
        sd[f"ppm.{i}.2.running_mean"] = branch[2].running_mean
        sd[f"ppm.{i}.2.running_var"] = branch[2].running_var
    cl = oracle.conv_last
    sd["conv_last_.0.weight"] = cl[0].weight
    sd["conv_last_.1.weight"] = cl[1].weight
    sd["conv_last_.1.bias"] = cl[1].bias
    sd["conv_last_.1.running_mean"] = cl[1].running_mean
    sd["conv_last_.1.running_var"] = cl[1].running_var
    sd["conv_last_.4.weight"] = cl[4].weight
    sd["conv_last_.4.bias"] = cl[4].bias
    return sd


def test_ppm_decoder_checkpoint_import():
    torch.manual_seed(1)
    oracle = TorchPPMDeepsup().eval()
    for m in oracle.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.4)
            m.running_var.uniform_(0.7, 1.3)

    rng = np.random.default_rng(1)
    conv5 = rng.standard_normal((1, 10, 12, FC_DIM), np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(conv5.transpose(0, 3, 1, 2)))

    dec = ModelBuilder.build_decoder("ppm_deepsup", fc_dim=FC_DIM,
                                     num_class=NUM_CLASS)
    conv_out = [jnp.zeros((1, 20, 24, 8)), jnp.zeros((1, 10, 12, FC_DIM // 2)),
                jnp.zeros((1, 10, 12, FC_DIM // 2)), jnp.asarray(conv5)]
    variables = dec.init({"params": KEY, "dropout": KEY}, conv_out, train=False)
    imported = import_ppm_decoder_state_dict(
        _reference_named_state_dict(oracle))
    variables = merge_variables(dict(variables), imported)

    (ours,) = dec.apply(variables, conv_out, train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
