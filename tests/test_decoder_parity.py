"""Full-decoder numerical parity: a torch replica of the reference
PPMDeepsup (models/models.py:938-995) with shared random weights must match
our flax decoder output — end-to-end fidelity of pools, resizes, convs and
eval-mode BN in one shot."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder

KEY = jax.random.PRNGKey(0)
FC_DIM, NUM_CLASS = 64, 7
SCALES = (1, 2, 3, 6)


class TorchPPMDeepsup(nn.Module):
    """Oracle replica of the reference decoder structure (eval mode)."""

    def __init__(self):
        super().__init__()
        self.ppm = nn.ModuleList([
            nn.Sequential(nn.AdaptiveAvgPool2d(s),
                          nn.Conv2d(FC_DIM, 512, 1, bias=False),
                          nn.BatchNorm2d(512), nn.ReLU())
            for s in SCALES])
        self.conv_last = nn.Sequential(
            nn.Conv2d(FC_DIM + 4 * 512, 512, 3, padding=1, bias=False),
            nn.BatchNorm2d(512), nn.ReLU(), nn.Dropout2d(0.1),
            nn.Conv2d(512, NUM_CLASS, 1))

    def forward(self, conv5):
        h, w = conv5.shape[2:]
        outs = [conv5]
        for branch in self.ppm:
            outs.append(F.interpolate(branch(conv5), (h, w), mode="bilinear",
                                      align_corners=False))
        return self.conv_last(torch.cat(outs, 1))


def test_ppm_deepsup_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TorchPPMDeepsup().eval()
    # non-trivial BN running stats
    for m in oracle.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(0)
    conv5 = rng.standard_normal((2, 12, 14, FC_DIM), np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(conv5.transpose(0, 3, 1, 2)))

    dec = ModelBuilder.build_decoder("ppm_deepsup", fc_dim=FC_DIM,
                                     num_class=NUM_CLASS)
    conv_out = [jnp.zeros((2, 24, 28, 8)), jnp.zeros((2, 12, 14, FC_DIM // 2)),
                jnp.zeros((2, 12, 14, FC_DIM // 2)), jnp.asarray(conv5)]
    variables = dec.init({"params": KEY, "dropout": KEY}, conv_out, train=False)

    # graft the oracle's weights into the flax tree
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    stats = jax.tree_util.tree_map(lambda x: x, variables["batch_stats"])

    def k(w):  # OIHW → HWIO
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))

    for i, branch in enumerate(oracle.ppm):
        params["ppm"][f"ppm_{i}_conv"]["conv"]["kernel"] = k(branch[1].weight)
        params["ppm"][f"ppm_{i}_bn"]["scale"] = jnp.asarray(branch[2].weight.detach().numpy())
        params["ppm"][f"ppm_{i}_bn"]["bias"] = jnp.asarray(branch[2].bias.detach().numpy())
        stats["ppm"][f"ppm_{i}_bn"]["mean"] = jnp.asarray(branch[2].running_mean.numpy())
        stats["ppm"][f"ppm_{i}_bn"]["var"] = jnp.asarray(branch[2].running_var.numpy())
    cl = oracle.conv_last
    params["conv_last_"]["0"]["conv"]["kernel"] = k(cl[0].weight)
    params["conv_last_"]["1"]["scale"] = jnp.asarray(cl[1].weight.detach().numpy())
    params["conv_last_"]["1"]["bias"] = jnp.asarray(cl[1].bias.detach().numpy())
    stats["conv_last_"]["1"]["mean"] = jnp.asarray(cl[1].running_mean.numpy())
    stats["conv_last_"]["1"]["var"] = jnp.asarray(cl[1].running_var.numpy())
    params["conv_last_"]["cls"]["conv"]["kernel"] = k(cl[4].weight)
    params["conv_last_"]["cls"]["conv"]["bias"] = jnp.asarray(cl[4].bias.detach().numpy())

    (ours,) = dec.apply({"params": params, "batch_stats": stats}, conv_out,
                        train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
