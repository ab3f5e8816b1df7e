"""UPerNet numerical parity: torch replica of the reference UPerNet
(models.py:1085-1172) with reference-named modules; its state_dict feeds
import_upernet_decoder_state_dict and the output must match our flax
decoder (eval mode, pre-log_softmax logits).

Covers the reference's quirks: PPM branches interpolate BEFORE the 1x1
conv (models.py:1134-1138), top-down FPN adds, and the [P2..P5] fusion
concat order."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.decoders import UPerNet
from cvpr2021_vspw_implement_tpu.models.import_torch import (
    import_upernet_decoder_state_dict, merge_variables)

KEY = jax.random.PRNGKey(0)
K, FC, FPN = 7, 128, 64
INPLANES = (16, 32, 64, FC)
SCALES = (1, 2, 3, 6)


def _cbr(cin, cout):
    return nn.Sequential(nn.Conv2d(cin, cout, 3, padding=1, bias=False),
                         nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


class TorchUPerNet(nn.Module):
    """Oracle whose state_dict keys match the reference UPerNet decoder."""

    def __init__(self):
        super().__init__()
        self.ppm_pooling = nn.ModuleList(
            [nn.AdaptiveAvgPool2d(s) for s in SCALES])
        self.ppm_conv = nn.ModuleList([
            nn.Sequential(nn.Conv2d(FC, 512, 1, bias=False),
                          nn.BatchNorm2d(512), nn.ReLU(inplace=True))
            for _ in SCALES])
        self.ppm_last_conv = _cbr(FC + len(SCALES) * 512, FPN)
        self.fpn_in = nn.ModuleList([
            nn.Sequential(nn.Conv2d(c, FPN, 1, bias=False),
                          nn.BatchNorm2d(FPN), nn.ReLU(inplace=True))
            for c in INPLANES[:-1]])
        self.fpn_out = nn.ModuleList([
            nn.Sequential(_cbr(FPN, FPN)) for _ in INPLANES[:-1]])
        self.conv_last_ = nn.Sequential(
            _cbr(len(INPLANES) * FPN, FPN), nn.Conv2d(FPN, K, 1))

    def forward(self, conv_out):
        conv5 = conv_out[-1]
        hw = conv5.shape[2:]
        ppm_out = [conv5]
        for pool, conv in zip(self.ppm_pooling, self.ppm_conv):
            ppm_out.append(conv(F.interpolate(
                pool(conv5), hw, mode="bilinear", align_corners=False)))
        f = self.ppm_last_conv(torch.cat(ppm_out, 1))

        fpn = [f]
        for i in reversed(range(len(conv_out) - 1)):
            lateral = self.fpn_in[i](conv_out[i])
            f = lateral + F.interpolate(f, lateral.shape[2:],
                                        mode="bilinear", align_corners=False)
            fpn.append(self.fpn_out[i](f))
        fpn.reverse()
        out_hw = fpn[0].shape[2:]
        fusion = [fpn[0]] + [F.interpolate(p, out_hw, mode="bilinear",
                                           align_corners=False)
                             for p in fpn[1:]]
        return self.conv_last_(torch.cat(fusion, 1))


def test_upernet_matches_torch_oracle_via_importer():
    torch.manual_seed(4)
    oracle = TorchUPerNet().eval()
    for m in oracle.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.weight.data.normal_(1.0, 0.1)
            m.bias.data.normal_(0, 0.1)
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.6, 1.4)

    rng = np.random.default_rng(4)
    feats = [rng.standard_normal((1, h, w, c), np.float32)
             for (h, w), c in zip(((32, 36), (16, 18), (16, 18), (16, 18)),
                                  INPLANES)]
    with torch.no_grad():
        ref = oracle([torch.from_numpy(f.transpose(0, 3, 1, 2))
                      for f in feats])

    dec = UPerNet(num_class=K, fc_dim=FC, fpn_dim=FPN)
    conv_out = [jnp.asarray(f) for f in feats]
    variables = dec.init({"params": KEY}, conv_out, train=False)
    imported = import_upernet_decoder_state_dict(oracle.state_dict())
    variables = merge_variables(dict(variables), imported)
    (ours,) = dec.apply(variables, conv_out, train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
