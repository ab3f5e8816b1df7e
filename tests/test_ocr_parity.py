"""OCR decoder numerical parity: torch replica of the reference
SpatialOCRNet (models/ocrnet.py:22-72 + spatial_ocr_block.py) with grafted
weights must match our flax decoder (eval mode)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.ocr import SpatialOCRNet

KEY = jax.random.PRNGKey(0)
NUM_CLASS, C4, C5 = 7, 96, 128


class TorchOCR(nn.Module):
    """Oracle replica of the reference OCR head structure."""

    def __init__(self):
        super().__init__()
        self.conv_3x3 = nn.Sequential(nn.Conv2d(C5, 512, 3, padding=1),
                                      nn.BatchNorm2d(512), nn.ReLU())
        self.dsn = nn.Sequential(nn.Conv2d(C4, 512, 3, padding=1),
                                 nn.BatchNorm2d(512), nn.ReLU(),
                                 nn.Dropout2d(0.05),
                                 nn.Conv2d(512, NUM_CLASS, 1))
        kc = 256

        def two_convs(cin, cout):
            return nn.Sequential(nn.Conv2d(cin, cout, 1),
                                 nn.BatchNorm2d(cout), nn.ReLU(),
                                 nn.Conv2d(cout, cout, 1),
                                 nn.BatchNorm2d(cout), nn.ReLU())

        self.f_pixel = two_convs(512, kc)
        self.f_object = two_convs(512, kc)
        self.f_down = nn.Sequential(nn.Conv2d(512, kc, 1),
                                    nn.BatchNorm2d(kc), nn.ReLU())
        self.f_up = nn.Sequential(nn.Conv2d(kc, 512, 1),
                                  nn.BatchNorm2d(512), nn.ReLU())
        self.fuse = nn.Sequential(nn.Conv2d(1024, 512, 1),
                                  nn.BatchNorm2d(512), nn.ReLU(),
                                  nn.Dropout2d(0.05))
        self.head = nn.Conv2d(512, NUM_CLASS, 1)

    def forward(self, c4, c5):
        x_dsn = self.dsn(c4)
        x = self.conv_3x3(c5)
        n, c, h, w = x.shape
        # SpatialGather (spatial_ocr_block.py:61-67)
        probs = F.softmax(x_dsn.view(n, NUM_CLASS, -1), dim=2)
        feats = x.view(n, c, -1).permute(0, 2, 1)
        ctx = torch.matmul(probs, feats).permute(0, 2, 1).unsqueeze(3)
        # ObjectAttention (spatial_ocr_block.py:247-274)
        q = self.f_pixel(x).view(n, 256, -1).permute(0, 2, 1)
        k = self.f_object(ctx).view(n, 256, -1)
        v = self.f_down(ctx).view(n, 256, -1).permute(0, 2, 1)
        sim = torch.matmul(q, k) * (256 ** -0.5)
        sim = F.softmax(sim, dim=-1)
        out = torch.matmul(sim, v).permute(0, 2, 1).contiguous()
        out = self.f_up(out.view(n, 256, h, w))
        fused = self.fuse(torch.cat([out, x], 1))
        return self.head(fused), x_dsn


def _graft(variables, oracle):
    p = variables["params"]
    s = variables["batch_stats"]

    def k(w):
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))

    def conv(dst_p, m, bias=True):
        dst_p["conv"]["kernel"] = k(m.weight)
        if bias and m.bias is not None:
            dst_p["conv"]["bias"] = jnp.asarray(m.bias.detach().numpy())

    def bn(dst_p, dst_s, m):
        dst_p["scale"] = jnp.asarray(m.weight.detach().numpy())
        dst_p["bias"] = jnp.asarray(m.bias.detach().numpy())
        dst_s["mean"] = jnp.asarray(m.running_mean.numpy())
        dst_s["var"] = jnp.asarray(m.running_var.numpy())

    conv(p["conv_3x3_conv"], oracle.conv_3x3[0])
    bn(p["conv_3x3_bn"], s["conv_3x3_bn"], oracle.conv_3x3[1])
    conv(p["dsn_head_cbr"]["0"], oracle.dsn[0])
    bn(p["dsn_head_cbr"]["1"], s["dsn_head_cbr"]["1"], oracle.dsn[1])
    conv(p["dsn_cls"], oracle.dsn[4])

    oc = "spatial_ocr_head"
    ob = p[oc]["object_context_block"]
    obs = s[oc]["object_context_block"]
    for i, (cm, bm) in enumerate([(oracle.f_pixel[0], oracle.f_pixel[1]),
                                  (oracle.f_pixel[3], oracle.f_pixel[4])]):
        conv(ob[f"f_pixel_{i}_conv"], cm)
        bn(ob[f"f_pixel_{i}_bn"], obs[f"f_pixel_{i}_bn"], bm)
    for i, (cm, bm) in enumerate([(oracle.f_object[0], oracle.f_object[1]),
                                  (oracle.f_object[3], oracle.f_object[4])]):
        conv(ob["f_object"][f"conv{i}"], cm)
        bn(ob["f_object"][f"bn{i}"], obs["f_object"][f"bn{i}"], bm)
    conv(ob["f_down"]["conv0"], oracle.f_down[0])
    bn(ob["f_down"]["bn0"], obs["f_down"]["bn0"], oracle.f_down[1])
    conv(ob["f_up_conv"], oracle.f_up[0])
    bn(ob["f_up_bn"], obs["f_up_bn"], oracle.f_up[1])
    conv(p[oc]["fuse_conv"], oracle.fuse[0])
    bn(p[oc]["fuse_bn"], s[oc]["fuse_bn"], oracle.fuse[1])
    conv(p["head"], oracle.head)
    return {"params": p, "batch_stats": s}


def _reference_named_state_dict(oracle):
    """Re-key the oracle's tensors with the reference SpatialOCRNet names
    (models/ocrnet.py:31-54, spatial_ocr_block.py:203-246, 350-367)."""
    sd = {}

    def seq(prefix, mods):
        for i, m in mods:
            if isinstance(m, nn.Conv2d):
                sd[f"{prefix}.{i}.weight"] = m.weight
                if m.bias is not None:
                    sd[f"{prefix}.{i}.bias"] = m.bias
            elif isinstance(m, nn.BatchNorm2d):
                sd[f"{prefix}.{i}.weight"] = m.weight
                sd[f"{prefix}.{i}.bias"] = m.bias
                sd[f"{prefix}.{i}.running_mean"] = m.running_mean
                sd[f"{prefix}.{i}.running_var"] = m.running_var

    seq("conv_3x3", [(0, oracle.conv_3x3[0]), (1, oracle.conv_3x3[1])])
    seq("dsn_head", [(0, oracle.dsn[0]), (1, oracle.dsn[1]),
                     (4, oracle.dsn[4])])
    ob = "spatial_ocr_head.object_context_block"
    seq(f"{ob}.f_pixel", [(0, oracle.f_pixel[0]), (1, oracle.f_pixel[1]),
                          (3, oracle.f_pixel[3]), (4, oracle.f_pixel[4])])
    seq(f"{ob}.f_object", [(0, oracle.f_object[0]), (1, oracle.f_object[1]),
                           (3, oracle.f_object[3]), (4, oracle.f_object[4])])
    seq(f"{ob}.f_down", [(0, oracle.f_down[0]), (1, oracle.f_down[1])])
    seq(f"{ob}.f_up", [(0, oracle.f_up[0]), (1, oracle.f_up[1])])
    seq("spatial_ocr_head.conv_bn_dropout",
        [(0, oracle.fuse[0]), (1, oracle.fuse[1])])
    sd["head.weight"] = oracle.head.weight
    sd["head.bias"] = oracle.head.bias
    return sd


def test_ocr_decoder_checkpoint_import():
    """The importer must reproduce the manual graft (and the torch oracle)."""
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_ocr_decoder_state_dict, merge_variables)

    torch.manual_seed(2)
    oracle = TorchOCR().eval()
    for m in oracle.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.6, 1.4)

    rng = np.random.default_rng(2)
    c4 = rng.standard_normal((1, 8, 9, C4), np.float32)
    c5 = rng.standard_normal((1, 8, 9, C5), np.float32)
    with torch.no_grad():
        ref, _ = oracle(torch.from_numpy(c4.transpose(0, 3, 1, 2)),
                        torch.from_numpy(c5.transpose(0, 3, 1, 2)))

    dec = SpatialOCRNet(num_class=NUM_CLASS)
    conv_out = [jnp.zeros((1, 16, 18, 8)), jnp.zeros((1, 8, 9, 16)),
                jnp.asarray(c4), jnp.asarray(c5)]
    variables = dec.init({"params": KEY, "dropout": KEY}, conv_out, train=False)
    imported = import_ocr_decoder_state_dict(
        _reference_named_state_dict(oracle))
    variables = merge_variables(dict(variables), imported)
    (ours,) = dec.apply(variables, conv_out, train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_ocr_decoder_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TorchOCR().eval()
    for m in oracle.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.6, 1.4)

    rng = np.random.default_rng(0)
    c4 = rng.standard_normal((2, 9, 11, C4), np.float32)
    c5 = rng.standard_normal((2, 9, 11, C5), np.float32)
    with torch.no_grad():
        ref, ref_dsn = oracle(torch.from_numpy(c4.transpose(0, 3, 1, 2)),
                              torch.from_numpy(c5.transpose(0, 3, 1, 2)))

    dec = SpatialOCRNet(num_class=NUM_CLASS)
    conv_out = [jnp.zeros((2, 18, 22, 8)), jnp.zeros((2, 9, 11, 16)),
                jnp.asarray(c4), jnp.asarray(c5)]
    variables = dec.init({"params": KEY, "dropout": KEY}, conv_out, train=False)
    variables = _graft(jax.tree_util.tree_map(lambda x: x, variables), oracle)

    (ours,) = dec.apply(variables, conv_out, train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
