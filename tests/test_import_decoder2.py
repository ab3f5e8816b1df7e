"""C1 / C1DeepSup / UPerNet decoder importers: exact structural cover of
the flax trees by reference-named state dicts (models.py:826-886, 1085-1128)."""

import torch

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
from cvpr2021_vspw_implement_tpu.models.import_torch import (
    import_c1_state_dict, import_upernet_decoder_state_dict)
from tests.test_import_fused import _assert_exact_cover, _bn

K, FC = 7, 512


def _conv_out():
    return [jnp.zeros((1, 16, 16, FC // 8)), jnp.zeros((1, 8, 8, FC // 4)),
            jnp.zeros((1, 8, 8, FC // 2)), jnp.zeros((1, 8, 8, FC))]


def _init(dec, train):
    key = jax.random.PRNGKey(0)
    return jax.eval_shape(
        lambda: dec.init({"params": key, "dropout": key}, _conv_out(),
                         train=train))


def test_c1_checkpoint_import_structural():
    torch.manual_seed(0)
    sd = {"cbr.0.weight": torch.randn(FC // 4, FC, 3, 3),
          "conv_last_1.weight": torch.randn(K, FC // 4, 1, 1),
          "conv_last_1.bias": torch.randn(K)}
    _bn(sd, "cbr.1", FC // 4)
    imported = import_c1_state_dict(sd)
    dec = ModelBuilder.build_decoder("c1", fc_dim=FC, num_class=K)
    _assert_exact_cover(_init(dec, False), imported)


def test_c1_deepsup_checkpoint_import_structural():
    torch.manual_seed(1)
    sd = {"cbr.0.weight": torch.randn(FC // 4, FC, 3, 3),
          "cbr_deepsup.0.weight": torch.randn(FC // 4, FC // 2, 3, 3),
          "conv_last_.weight": torch.randn(K, FC // 4, 1, 1),
          "conv_last_.bias": torch.randn(K),
          "conv_last_deepsup_.weight": torch.randn(K, FC // 4, 1, 1),
          "conv_last_deepsup_.bias": torch.randn(K)}
    _bn(sd, "cbr.1", FC // 4)
    _bn(sd, "cbr_deepsup.1", FC // 4)
    imported = import_c1_state_dict(sd, deepsup=True)
    dec = ModelBuilder.build_decoder("c1_deepsup", fc_dim=FC, num_class=K)
    _assert_exact_cover(_init(dec, True), imported)


def test_upernet_checkpoint_import_structural():
    torch.manual_seed(2)
    fpn = 512  # arch 'upernet' uses fpn_dim=512 (models.py:630-635)
    sd = {}
    for i in range(4):
        sd[f"ppm_conv.{i}.0.weight"] = torch.randn(512, FC, 1, 1)
        _bn(sd, f"ppm_conv.{i}.1", 512)
    sd["ppm_last_conv.0.weight"] = torch.randn(fpn, FC + 4 * 512, 3, 3)
    _bn(sd, "ppm_last_conv.1", fpn)
    for i, cin in enumerate((FC // 8, FC // 4, FC // 2)):
        sd[f"fpn_in.{i}.0.weight"] = torch.randn(fpn, cin, 1, 1)
        _bn(sd, f"fpn_in.{i}.1", fpn)
        sd[f"fpn_out.{i}.0.0.weight"] = torch.randn(fpn, fpn, 3, 3)
        _bn(sd, f"fpn_out.{i}.0.1", fpn)
    sd["conv_last_.0.0.weight"] = torch.randn(fpn, 4 * fpn, 3, 3)
    _bn(sd, "conv_last_.0.1", fpn)
    sd["conv_last_.1.weight"] = torch.randn(K, fpn, 1, 1)
    sd["conv_last_.1.bias"] = torch.randn(K)
    imported = import_upernet_decoder_state_dict(sd)
    dec = ModelBuilder.build_decoder("upernet", fc_dim=FC, num_class=K)
    _assert_exact_cover(_init(dec, False), imported)
