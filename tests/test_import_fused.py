"""Fused NetWarp / ETC checkpoint importers: every imported leaf must land
on an existing slot of our flax tree with a matching shape, and every model
slot must be covered (structural compatibility with the reference's saved
fused models — netwarp.py:67-107, ETC.py:51-80)."""

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
FC, K = 512, 7

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _ref_resnet18_sd():
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
    enc = mod.resnet18(pretrained=False)
    return {k: v for k, v in enc.state_dict().items()
            if not k.startswith(("fc", "avgpool"))}


def _ref_raft_sd():
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "RAFT_core"))
    try:
        from RAFT_core.raft import RAFT as TorchRAFT  # noqa
    finally:
        sys.path.pop(0), sys.path.pop(0)
    return TorchRAFT(requires_grad=False).state_dict()


def _bn(sd, prefix, c):
    sd[f"{prefix}.weight"] = torch.randn(c)
    sd[f"{prefix}.bias"] = torch.randn(c)
    sd[f"{prefix}.running_mean"] = torch.randn(c)
    sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5


def _ppm_clip_decoder_sd():
    """PPMDeepsup_clip key layout (models.py:998-1021): ppm.{i}.1/2,
    cbr_deepsup.{0,1}, conv_last_.{0,1} (no classifier), conv_last_deepsup_."""
    sd = {}
    for i in range(4):
        sd[f"ppm.{i}.1.weight"] = torch.randn(512, FC, 1, 1)
        _bn(sd, f"ppm.{i}.2", 512)
    sd["cbr_deepsup.0.weight"] = torch.randn(FC // 4, FC // 2, 3, 3)
    _bn(sd, "cbr_deepsup.1", FC // 4)
    sd["conv_last_.0.weight"] = torch.randn(512, FC + 4 * 512, 3, 3)
    _bn(sd, "conv_last_.1", 512)
    sd["conv_last_deepsup_.weight"] = torch.randn(K, FC // 4, 1, 1)
    sd["conv_last_deepsup_.bias"] = torch.randn(K)
    return sd


def _flowcnn_sd():
    """FlowCNN conv3x3_bn_relu stack (netwarp.py:49-55)."""
    sd = {}
    for n, (cin, cout) in enumerate([(11, 16), (16, 32), (32, 2), (4, 2)], 1):
        sd[f"flowcnn.conv{n}.0.weight"] = torch.randn(cout, cin, 3, 3)
        _bn(sd, f"flowcnn.conv{n}.1", cout)
    return sd


def _paths(tree, pre=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, pre + k + "/"))
        else:
            out[pre + k] = tuple(np.shape(v))
    return out


def _assert_exact_cover(variables, imported):
    for coll in ("params", "batch_stats"):
        want = _paths(variables[coll])
        have = _paths(imported[coll])
        extra = set(have) - set(want)
        assert not extra, f"imported keys without a slot: {sorted(extra)[:6]}"
        uncovered = set(want) - set(have)
        assert not uncovered, f"model slots not imported: {sorted(uncovered)[:6]}"
        for p in want:
            assert want[p] == have[p], \
                f"shape mismatch at {p}: {want[p]} vs {have[p]}"


def test_netwarp_fused_import_structurally_complete():
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_netwarp_state_dict)
    from cvpr2021_vspw_implement_tpu.models.netwarp import NetWarp

    torch.manual_seed(0)
    sd = {}
    for k, v in _ref_raft_sd().items():
        sd[f"raft.{k}"] = v
    for k, v in _ref_resnet18_sd().items():
        sd[f"encoder.{k}"] = v
    for k, v in _ppm_clip_decoder_sd().items():
        sd[f"decoder.{k}"] = v
    sd.update(_flowcnn_sd())
    blend = FC + 4 * 512
    sd["conv_last_.0.weight"] = torch.randn(512, blend, 3, 3)
    _bn(sd, "conv_last_.1", 512)
    sd["conv_last_.4.weight"] = torch.randn(K, 512, 1, 1)
    sd["conv_last_.4.bias"] = torch.randn(K)
    sd["w0_0"] = torch.ones(FC)
    sd["w0_1"] = torch.zeros(FC)
    sd["w1_0"] = torch.ones(blend)
    sd["w1_1"] = torch.zeros(blend)

    imported = import_netwarp_state_dict(sd)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = NetWarp(encoder=enc, num_class=K, fc_dim=FC, raft_iters=2)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key},
                           jnp.zeros((2, 1, 64, 64, 3)), train=True))
    _assert_exact_cover(variables, imported)


def test_clip_warp_fused_import_structurally_complete():
    import argparse

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_clip_warp_state_dict)
    from cvpr2021_vspw_implement_tpu.models.warp_our import ClipWarpNet

    torch.manual_seed(2)
    sd = {}
    for k, v in _ref_resnet18_sd().items():
        sd[f"encoder.{k}"] = v
    for k, v in _ppm_clip_decoder_sd().items():
        sd[f"decoder.{k}"] = v
    # WarpNet(args, fc_dim=128): emb 512->256, emb_2 512->128 (models.py:125)
    sd["prop_clip.emb.0.weight"] = torch.randn(256, 512, 3, 3)
    _bn(sd, "prop_clip.emb.1", 256)
    sd["prop_clip.emb_2.0.weight"] = torch.randn(128, 512, 3, 3)
    _bn(sd, "prop_clip.emb_2.1", 128)
    sd["prop_clip.last_layer.1.weight"] = torch.randn(K, 256, 1, 1)
    sd["prop_clip.last_layer.1.bias"] = torch.randn(K)
    for i in range(3):
        sd[f"prop_clip.w{i}"] = torch.ones(256)
    sd["last_layer.1.weight"] = torch.randn(K, 128, 1, 1)
    sd["last_layer.1.bias"] = torch.randn(K)

    imported = import_clip_warp_state_dict(sd)

    args = argparse.Namespace(fix=False, max_distances=[2],
                              linear_combine=True, distsoftmax=False,
                              distnearest=False, temp=3.0)
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipWarpNet(encoder=enc, num_class=K, fc_dim=FC, args=args)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key},
                           jnp.zeros((3, 1, 32, 32, 3)), train=True))
    _assert_exact_cover(variables, imported)


def test_propnet_fused_import_structurally_complete():
    import argparse

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_propnet_state_dict)
    from cvpr2021_vspw_implement_tpu.models.propnet import PropNet

    torch.manual_seed(3)
    emb_dim = 256
    sd = {}
    for k, v in _ref_resnet18_sd().items():
        sd[f"encoder.{k}"] = v
    for k, v in _ppm_clip_decoder_sd().items():
        sd[f"decoder.{k}"] = v
    for nm in ("emb", "emb2"):
        sd[f"{nm}.0.weight"] = torch.randn(emb_dim, 512, 3, 3)
        _bn(sd, f"{nm}.1", emb_dim)
    sd["last_layer.1.weight"] = torch.randn(K, emb_dim, 1, 1)
    sd["last_layer.1.bias"] = torch.randn(K)
    # SegBlock(emb_dim + num_class -> emb_dim), 4 split-separable convs
    cin = emb_dim + K
    for i in range(1, 5):
        sd[f"segblock.conv{i}.conv1.weight"] = torch.randn(cin, 1, 7, 7)
        sd[f"segblock.conv{i}.conv1.bias"] = torch.randn(cin)
        _bn(sd, f"segblock.conv{i}.bn1", cin)
        sd[f"segblock.conv{i}.conv2.weight"] = torch.randn(emb_dim, cin, 1, 1)
        sd[f"segblock.conv{i}.conv2.bias"] = torch.randn(emb_dim)
        _bn(sd, f"segblock.conv{i}.bn2", emb_dim)
        cin = emb_dim
    sd["segblock.last_layer.weight"] = torch.randn(K, emb_dim, 1, 1)
    sd["segblock.last_layer.bias"] = torch.randn(K)

    imported = import_propnet_state_dict(sd)

    args = argparse.Namespace(fix=False, max_distances=[2],
                              linear_combine=False, distsoftmax=False,
                              distnearest=False, temp=3.0)
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = PropNet(encoder=enc, num_class=K, fc_dim=FC, args=args)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key},
                           jnp.zeros((3, 1, 32, 32, 3)), train=True))
    _assert_exact_cover(variables, imported)


def test_clip_ocr_fused_import_structurally_complete():
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_ocr import ClipOCRNet
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_clip_ocr_state_dict)

    torch.manual_seed(4)
    kc = 256
    sd = {}
    for k, v in _ref_resnet18_sd().items():
        sd[f"encoder.{k}"] = v
    sd["conv_3x3.0.weight"] = torch.randn(512, FC, 3, 3)
    sd["conv_3x3.0.bias"] = torch.randn(512)
    _bn(sd, "conv_3x3.1", 512)
    sd["dsn_head.0.weight"] = torch.randn(512, FC // 2, 3, 3)
    sd["dsn_head.0.bias"] = torch.randn(512)
    _bn(sd, "dsn_head.1", 512)
    sd["dsn_head.4.weight"] = torch.randn(K, 512, 1, 1)
    sd["dsn_head.4.bias"] = torch.randn(K)
    ob = "spatial_ocr_head.object_context_block"
    for blk in ("f_pixel", "f_object"):
        for i, cin in ((0, 512), (3, kc)):
            sd[f"{ob}.{blk}.{i}.weight"] = torch.randn(kc, cin, 1, 1)
            sd[f"{ob}.{blk}.{i}.bias"] = torch.randn(kc)
            _bn(sd, f"{ob}.{blk}.{i + 1}", kc)
    sd[f"{ob}.f_down.0.weight"] = torch.randn(kc, 512, 1, 1)
    sd[f"{ob}.f_down.0.bias"] = torch.randn(kc)
    _bn(sd, f"{ob}.f_down.1", kc)
    sd[f"{ob}.f_up.0.weight"] = torch.randn(512, kc, 1, 1)
    sd[f"{ob}.f_up.0.bias"] = torch.randn(512)
    _bn(sd, f"{ob}.f_up.1", 512)
    sd["spatial_ocr_head.conv_bn_dropout.0.weight"] = torch.randn(512, 1024, 1, 1)
    sd["spatial_ocr_head.conv_bn_dropout.0.bias"] = torch.randn(512)
    _bn(sd, "spatial_ocr_head.conv_bn_dropout.1", 512)
    sd["head.weight"] = torch.randn(K, 512, 1, 1)
    sd["head.bias"] = torch.randn(K)

    imported = import_clip_ocr_state_dict(sd)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipOCRNet(encoder=enc, num_class=K)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key},
                           jnp.zeros((3, 1, 32, 32, 3)), train=True))
    _assert_exact_cover(variables, imported)


def test_nonlocal3d_fused_import_structurally_complete():
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_nonlocal3d_state_dict)
    from cvpr2021_vspw_implement_tpu.models.nonlocal3d import NonLocal3D

    torch.manual_seed(5)
    inter = 128
    sd = {}
    for k, v in _ref_resnet18_sd().items():
        sd[f"encoder.{k}"] = v
    sd["emb.weight"] = torch.randn(256, FC, 1, 1)
    sd["emb.bias"] = torch.randn(256)
    for nm in ("g", "theta", "phi"):  # Conv3d 1x1x1 projections
        sd[f"nonlocalblock.{nm}.weight"] = torch.randn(inter, 256, 1, 1, 1)
        sd[f"nonlocalblock.{nm}.bias"] = torch.randn(inter)
    sd["nonlocalblock.W_z.0.weight"] = torch.randn(256, inter, 1, 1, 1)
    sd["nonlocalblock.W_z.0.bias"] = torch.randn(256)
    _bn(sd, "nonlocalblock.W_z.1", 256)
    sd["last_layer.weight"] = torch.randn(K, 512, 1, 1)
    sd["last_layer.bias"] = torch.randn(K)

    imported = import_nonlocal3d_state_dict(sd)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = NonLocal3D(encoder=enc, num_class=K, fc_dim=FC)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key},
                           jnp.zeros((3, 1, 32, 32, 3)), train=True))
    _assert_exact_cover(variables, imported)


def test_warp_merge_fused_import_structurally_complete():
    import argparse

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_warp_merge_state_dict)
    from cvpr2021_vspw_implement_tpu.models.warp_our_merge import OurWarpMerge

    torch.manual_seed(6)
    emb_dim = 256
    sd = {}
    for k, v in _ref_resnet18_sd().items():
        sd[f"encoder.{k}"] = v
    # PPM_clip decoder: like PPMDeepsup_clip but the deepsup heads are
    # absent from the forward; cbr_deepsup is created-but-unused → included
    # here to prove the importer drops it (models.py:1062)
    for k, v in _ppm_clip_decoder_sd().items():
        if not k.startswith("conv_last_deepsup_"):
            sd[f"decoder.{k}"] = v
    sd["prop_clip.emb.0.weight"] = torch.randn(emb_dim, 512, 3, 3)
    _bn(sd, "prop_clip.emb.1", emb_dim)
    # emb2 consumes conv4: 1024-ch on the reference's resnet101; 256 here
    sd["prop_clip.emb2.0.weight"] = torch.randn(emb_dim, FC // 2, 3, 3)
    _bn(sd, "prop_clip.emb2.1", emb_dim)
    sd["prop_clip.last_layer.1.weight"] = torch.randn(K, emb_dim, 1, 1)
    sd["prop_clip.last_layer.1.bias"] = torch.randn(K)
    sd["prop_clip.last_layer2.1.weight"] = torch.randn(K, emb_dim * 2, 1, 1)
    sd["prop_clip.last_layer2.1.bias"] = torch.randn(K)
    sd["last_layer.1.weight"] = torch.randn(K, emb_dim, 1, 1)
    sd["last_layer.1.bias"] = torch.randn(K)

    imported = import_warp_merge_state_dict(sd)

    args = argparse.Namespace(fix=False, max_distances=[2],
                              linear_combine=False, distsoftmax=False,
                              distnearest=False, temp=3.0)
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = OurWarpMerge(encoder=enc, num_class=K, fc_dim=FC, args=args)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key},
                           jnp.zeros((3, 1, 32, 32, 3)), train=True))
    _assert_exact_cover(variables, imported)


def test_etc_fused_import_structurally_complete():
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.etc import ETC
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_etc_state_dict)

    torch.manual_seed(1)
    sd = {}
    for k, v in _ref_raft_sd().items():
        sd[f"raft.{k}"] = v
    for k, v in _ref_resnet18_sd().items():
        sd[f"encoder.{k}"] = v
    for k, v in _ppm_clip_decoder_sd().items():
        sd[f"decoder.{k}"] = v
    sd["conv_last_.0.weight"] = torch.randn(512, FC + 4 * 512, 3, 3)
    _bn(sd, "conv_last_.1", 512)
    sd["conv_last_.4.weight"] = torch.randn(K, 512, 1, 1)
    sd["conv_last_.4.bias"] = torch.randn(K)

    imported = import_etc_state_dict(sd)

    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ETC(encoder=enc, num_class=K, fc_dim=FC, raft_iters=2)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key},
                           jnp.zeros((2, 1, 64, 64, 3)), train=True))
    _assert_exact_cover(variables, imported)
