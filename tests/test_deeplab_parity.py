"""DeepLabV3+ decoder numerical parity: torch replica of the reference
DeepLab decoder (models/deeplab.py:36-168) with reference-named modules;
its state_dict feeds import_deeplab_decoder_state_dict and the output must
match our flax decoder (eval mode, pre-log_softmax logits)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.deeplab import DeepLab
from cvpr2021_vspw_implement_tpu.models.import_torch import (
    import_deeplab_decoder_state_dict, merge_variables)

KEY = jax.random.PRNGKey(0)
NUM_CLASS, C_LOW, C_HIGH = 7, 32, 64
DIL = (1, 12, 24, 36)  # output stride 8 (resnet backbone)


class _Branch(nn.Module):
    def __init__(self, cin, k, dilation):
        super().__init__()
        pad = 0 if k == 1 else dilation
        self.atrous_conv = nn.Conv2d(cin, 256, k, padding=pad,
                                     dilation=dilation, bias=False)
        self.bn = nn.BatchNorm2d(256)

    def forward(self, x):
        return F.relu(self.bn(self.atrous_conv(x)))


class _ASPP(nn.Module):
    def __init__(self):
        super().__init__()
        self.aspp1 = _Branch(C_HIGH, 1, DIL[0])
        self.aspp2 = _Branch(C_HIGH, 3, DIL[1])
        self.aspp3 = _Branch(C_HIGH, 3, DIL[2])
        self.aspp4 = _Branch(C_HIGH, 3, DIL[3])
        self.global_avg_pool = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, 1)),
            nn.Conv2d(C_HIGH, 256, 1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU())
        self.conv1 = nn.Conv2d(1280, 256, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(256)

    def forward(self, x):
        xs = [self.aspp1(x), self.aspp2(x), self.aspp3(x), self.aspp4(x)]
        g = self.global_avg_pool(x)
        xs.append(F.interpolate(g, size=xs[0].shape[2:], mode="bilinear",
                                align_corners=True))
        x = self.conv1(torch.cat(xs, dim=1))
        return F.relu(self.bn1(x))  # dropout is identity in eval


class _Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(C_LOW, 48, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(48)
        self.last_conv = nn.Sequential(
            nn.Conv2d(304, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(), nn.Dropout(0.5),
            nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU())
        self.lastlast_conv = nn.Sequential(
            nn.Dropout(0.1), nn.Conv2d(256, NUM_CLASS, 1))

    def forward(self, x, low):
        low = F.relu(self.bn1(self.conv1(low)))
        x = F.interpolate(x, size=low.shape[2:], mode="bilinear",
                          align_corners=True)
        x = self.last_conv(torch.cat((x, low), dim=1))
        return self.lastlast_conv(x)


class TorchDeepLab(nn.Module):
    """Oracle whose state_dict keys match the reference DeepLab decoder."""

    def __init__(self):
        super().__init__()
        self.aspp = _ASPP()
        self.decoder = _Decoder()

    def forward(self, c2, c5):
        return self.decoder(self.aspp(c5), c2)


def test_deeplab_decoder_checkpoint_import():
    torch.manual_seed(3)
    oracle = TorchDeepLab().eval()
    for m in oracle.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.weight.data.normal_(1.0, 0.1)
            m.bias.data.normal_(0, 0.1)
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.6, 1.4)

    rng = np.random.default_rng(3)
    c2 = rng.standard_normal((1, 16, 18, C_LOW), np.float32)
    c5 = rng.standard_normal((1, 8, 9, C_HIGH), np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(c2.transpose(0, 3, 1, 2)),
                     torch.from_numpy(c5.transpose(0, 3, 1, 2)))

    dec = DeepLab(num_class=NUM_CLASS, fc_dim=C_HIGH)
    conv_out = [jnp.asarray(c2), jnp.zeros((1, 8, 9, 8)),
                jnp.zeros((1, 8, 9, 8)), jnp.asarray(c5)]
    variables = dec.init({"params": KEY, "dropout": KEY}, conv_out,
                         train=False)
    imported = import_deeplab_decoder_state_dict(oracle.state_dict())
    variables = merge_variables(dict(variables), imported)
    (ours,) = dec.apply(variables, conv_out, train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
