"""Numeric oracle parity for the FUSED temporal methods.

For each temporal method, instantiate the ACTUAL reference torch module
(loaded from /root/reference), run its inference forward (``segSize``
branch), push its ``state_dict()`` through our fused importer, run our JAX
model on the same input, and assert the softmax probabilities agree.

This upgrades tests/test_import_fused.py from structural to numeric: a
wiring bug anywhere in importer or forward fails these tests.
(Reference forwards: models/clip_psp.py:136-217, models/clip_ocr.py:106-198,
models/netwarp.py:150-239, models/ETC.py:93-189, models/models.py:116-282,
models/propnet.py:121-267, models/warp_our_merge.py:53-270,
models/non_local_models.py:9-112, models/td4_psp/td4_psp.py:85-330.)
"""

import argparse
import importlib
import os
import sys
import types
from collections import OrderedDict

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"
K = 7          # num_class
H = W = 48     # divisible by 8 (OS-8) and by 3 (td4 stride-3 subsample)
B = 1

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

IMAGENET_MEAN = torch.tensor([0.485, 0.456, 0.406])
IMAGENET_STD = torch.tensor([0.229, 0.224, 0.225])


def _ref_import(modname):
    """Import a reference module under the stubbed top-level ``models``
    package (so the reference's absolute/relative imports resolve against
    /root/reference without putting its other top-level files on sys.path
    permanently)."""
    if "torchvision" not in sys.modules:
        # torchvision is not in this env; the reference model files import it
        # without using it, and dataset2.py uses only transforms.Normalize
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        class _Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean)
                self.std = torch.tensor(std)

            def __call__(self, t):
                return ((t - self.mean[:, None, None])
                        / self.std[:, None, None])

        tr.Normalize = _Normalize
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    if "models" not in sys.modules or not getattr(
            sys.modules.get("models"), "__graft_stub__", False):
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF, "models")]
        pkg.__graft_stub__ = True
        sys.modules["models"] = pkg
    # RAFT_core/raft.py does `from update import ...` (cwd-relative layout)
    sys.path.insert(0, os.path.join(REF, "RAFT_core"))
    sys.path.insert(0, REF)
    try:
        return importlib.import_module(modname)
    finally:
        sys.path.remove(REF)
        sys.path.remove(os.path.join(REF, "RAFT_core"))


def _frames(n, seed=0, hw=None):
    """n ImageNet-normalized NCHW frames (the reference data convention,
    dataset2.py:531-533)."""
    h, w = hw if hw is not None else (H, W)
    g = torch.Generator().manual_seed(seed)
    out = []
    for _ in range(n):
        x = torch.rand((B, 3, h, w), generator=g)
        out.append((x - IMAGENET_MEAN[None, :, None, None])
                   / IMAGENET_STD[None, :, None, None])
    return out


def _to_jax(frames):
    """list of NCHW torch frames -> [T, B, H, W, 3] jnp (same order)."""
    return jnp.asarray(np.stack(
        [f.numpy().transpose(0, 2, 3, 1) for f in frames], axis=0))


def _ref_encoder(arch="resnet50dilated"):
    mm = _ref_import("models.models")
    torch.manual_seed(0)
    return mm.ModelBuilder.build_encoder(arch=arch, weights="")


def _randomize(model, seed):
    """Give every parameter/buffer a non-degenerate random value so parity
    is meaningful (fresh-init BN gammas are all-1 etc.)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.05)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) * 0.5 + 0.75)
    return model


def _probs_close(ref_probs_nchw, jax_probs_nhwc, atol=1e-4):
    ref = ref_probs_nchw.detach().numpy().transpose(0, 2, 3, 1)
    # guard against degenerate (uniform) outputs that would make parity
    # vacuous
    assert np.std(ref) > 1e-3, "oracle output is degenerate"
    np.testing.assert_allclose(np.asarray(jax_probs_nhwc), ref,
                               rtol=1e-3, atol=atol)


def _build_jax_encoder(arch="resnet50dilated"):
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    return ModelBuilder.build_encoder(arch)


# --------------------------------------------------------------------------
# clip_psp
# --------------------------------------------------------------------------

@pytest.mark.parametrize("psp_weight", [False, True])
def test_clip_psp_numeric_parity(psp_weight):
    from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_clip_psp_state_dict)
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)

    ref_clip_psp = _ref_import("models.clip_psp")
    args = argparse.Namespace(num_class=K, psp_weight=psp_weight)
    tmodel = ref_clip_psp.Clip_PSP(_ref_encoder(), torch.nn.NLLLoss(),
                                   args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=11)
    tmodel.eval()

    frames = _frames(4, seed=1)  # [f0, f1, f2, target]
    feed = {"img_data": frames[-1], "clipimgs_data": list(frames[:-1]),
            "seg_label": torch.zeros((B, 1, H, W))}
    with torch.no_grad():
        ref_probs = tmodel(feed, segSize=(H, W))

    imported = import_clip_psp_state_dict(tmodel.state_dict())
    model = ClipPSP(encoder=_build_jax_encoder(), num_class=K, fc_dim=2048,
                    psp_weight=psp_weight)
    outs = model.apply(imported, _to_jax(frames), train=False)
    _probs_close(ref_probs, inference_probs(outs, (H, W)))


# --------------------------------------------------------------------------
# clip_ocr
# --------------------------------------------------------------------------

@pytest.mark.parametrize("clipocr_all", [False, True])
def test_clip_ocr_numeric_parity(clipocr_all):
    from cvpr2021_vspw_implement_tpu.models.clip_ocr import ClipOCRNet
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_clip_ocr_state_dict)
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)

    ref_clip_ocr = _ref_import("models.clip_ocr")
    args = argparse.Namespace(num_class=K, use_memory=False,
                              clipocr_all=clipocr_all)
    tmodel = ref_clip_ocr.ClipOCRNet(_ref_encoder(), torch.nn.NLLLoss(),
                                     args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=12)
    tmodel.eval()

    # the reference's clipocr_all inference path is broken upstream for
    # clip_num>0 (SpatialTemporalGather means contexts down to batch B but
    # spatial_ocr_head then consumes batch (T+1)B, clip_ocr.py:137-140); our
    # model broadcasts the blended context.  Parity is therefore provable at
    # clip_num=0 only, where broadcast == identity.
    frames = _frames(1 if clipocr_all else 4, seed=2)
    feed = {"img_data": frames[-1], "clipimgs_data": list(frames[:-1]),
            "seg_label": torch.zeros((B, 1, H, W))}
    with torch.no_grad():
        ref_probs = tmodel(feed, segSize=(H, W))

    imported = import_clip_ocr_state_dict(tmodel.state_dict())
    model = ClipOCRNet(encoder=_build_jax_encoder(), num_class=K,
                       clipocr_all=clipocr_all)
    outs = model.apply(imported, _to_jax(frames), train=False)
    _probs_close(ref_probs, inference_probs(outs, (H, W)))


# --------------------------------------------------------------------------
# netwarp / ETC (+_ocr): need a RAFT checkpoint at ./RAFT_core/... (the
# reference constructors torch.load it relative to cwd)
# --------------------------------------------------------------------------

def _stage_raft_ckpt(tmp_path, monkeypatch):
    raft_mod = _ref_import("RAFT_core.raft")
    sd = OrderedDict(("module." + k, v)
                     for k, v in raft_mod.RAFT().state_dict().items())
    os.makedirs(tmp_path / "RAFT_core", exist_ok=True)
    torch.save(sd, str(tmp_path / "RAFT_core" / "raft-things.pth-no-zip"))
    monkeypatch.chdir(tmp_path)


def test_netwarp_numeric_parity(tmp_path, monkeypatch):
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_netwarp_state_dict)
    from cvpr2021_vspw_implement_tpu.models.netwarp import NetWarp
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)

    _stage_raft_ckpt(tmp_path, monkeypatch)
    ref_nw = _ref_import("models.netwarp")
    mm = _ref_import("models.models")
    args = argparse.Namespace(num_class=K, clip_num=2)
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=2048,
                                        num_class=K)
    tmodel = ref_nw.NetWarp(_ref_encoder(), dec, torch.nn.NLLLoss(),
                            args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=14)
    tmodel.eval()

    h = w = 128  # RAFT corr pyramid: coarsest level needs >=2x2 (H/64), else bilinear_sampler divides by W-1=0
    frames = _frames(2, hw=(h, w), seed=4)  # [prev, target]
    feed = {"img_data": frames[-1], "clipimgs_data": [frames[0]],
            "seg_label": torch.zeros((B, 1, h, w))}
    with torch.no_grad():
        ref_probs = tmodel(feed, segSize=(h, w))

    imported = import_netwarp_state_dict(tmodel.state_dict())
    model = NetWarp(encoder=_build_jax_encoder(), num_class=K, fc_dim=2048,
                    raft_iters=20)
    outs = model.apply(imported, _to_jax(frames), train=False)
    _probs_close(ref_probs, inference_probs(outs, (h, w)), atol=1e-3)


def test_etc_numeric_parity(tmp_path, monkeypatch):
    from cvpr2021_vspw_implement_tpu.models.etc import ETC
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_etc_state_dict)
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)

    _stage_raft_ckpt(tmp_path, monkeypatch)
    ref_etc = _ref_import("models.ETC")
    mm = _ref_import("models.models")
    args = argparse.Namespace(num_class=K, clip_num=2, dilation_num=0,
                              st_weight=1.0)
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=2048,
                                        num_class=K)
    tmodel = ref_etc.ETC(_ref_encoder(), dec, torch.nn.NLLLoss(),
                         args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=15)
    tmodel.eval()

    frames = _frames(2, seed=5)
    feed = {"img_data": frames[-1], "clipimgs_data": [frames[0]],
            "seg_label": torch.zeros((B, 1, H, W))}
    with torch.no_grad():
        # ETC inference is single-frame (ETC.py:181-189)
        ref_probs = tmodel(feed, segSize=(H, W))

    imported = import_etc_state_dict(tmodel.state_dict())
    model = ETC(encoder=_build_jax_encoder(), num_class=K, fc_dim=2048)
    outs = model.apply(imported, _to_jax(frames), train=False)
    _probs_close(ref_probs, inference_probs(outs, (H, W)))


def test_netwarp_ocr_numeric_parity(tmp_path, monkeypatch):
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_netwarp_state_dict)
    from cvpr2021_vspw_implement_tpu.models.netwarp import NetWarp
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)

    _stage_raft_ckpt(tmp_path, monkeypatch)
    ref_nwo = _ref_import("models.netwarp_ocr")
    args = argparse.Namespace(num_class=K, clip_num=2)
    tmodel = ref_nwo.NetWarp_ocr(_ref_encoder(), torch.nn.NLLLoss(),
                                 args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=16)
    tmodel.eval()

    h = w = 128  # RAFT corr pyramid: coarsest level needs >=2x2 (H/64), else bilinear_sampler divides by W-1=0
    frames = _frames(2, hw=(h, w), seed=6)
    feed = {"img_data": frames[-1], "clipimgs_data": [frames[0]],
            "seg_label": torch.zeros((B, 1, h, w))}
    with torch.no_grad():
        ref_probs = tmodel(feed, segSize=(h, w))

    imported = import_netwarp_state_dict(tmodel.state_dict(), ocr=True)
    model = NetWarp(encoder=_build_jax_encoder(), num_class=K, fc_dim=2048,
                    ocr=True, raft_iters=20)
    outs = model.apply(imported, _to_jax(frames), train=False)
    _probs_close(ref_probs, inference_probs(outs, (h, w)), atol=1e-3)


def test_etc_ocr_numeric_parity(tmp_path, monkeypatch):
    from cvpr2021_vspw_implement_tpu.models.etc import ETC
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_etc_state_dict)
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)

    _stage_raft_ckpt(tmp_path, monkeypatch)
    ref_eo = _ref_import("models.ETC_ocr")
    args = argparse.Namespace(num_class=K, clip_num=2, dilation_num=0,
                              st_weight=1.0)
    tmodel = ref_eo.ETC_ocr(_ref_encoder(), torch.nn.NLLLoss(),
                            args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=17)
    tmodel.eval()

    frames = _frames(2, seed=7)
    feed = {"img_data": frames[-1], "clipimgs_data": [frames[0]],
            "seg_label": torch.zeros((B, 1, H, W))}
    with torch.no_grad():
        ref_probs = tmodel(feed, segSize=(H, W))

    imported = import_etc_state_dict(tmodel.state_dict(), ocr=True)
    model = ETC(encoder=_build_jax_encoder(), num_class=K, fc_dim=2048,
                ocr=True)
    outs = model.apply(imported, _to_jax(frames), train=False)
    _probs_close(ref_probs, inference_probs(outs, (H, W)))


# --------------------------------------------------------------------------
# our_warp / propnet / our_warp_merge (local cost-volume family)
# --------------------------------------------------------------------------

def _warp_args(**kw):
    base = dict(num_class=K, clip_num=3, fix=False, max_distances=[2],
                linear_combine=False, distsoftmax=False, distnearest=False,
                temp=3.0, allsup=False, allsup_scale=1.0)
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.mark.parametrize("mode", ["sigmoid_linear", "distsoftmax",
                                  "distnearest"])
def test_our_warp_numeric_parity(mode):
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_clip_warp_state_dict)
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)
    from cvpr2021_vspw_implement_tpu.models.warp_our import ClipWarpNet

    mm = _ref_import("models.models")
    args = _warp_args(linear_combine=(mode == "sigmoid_linear"),
                      distsoftmax=(mode == "distsoftmax"),
                      distnearest=(mode == "distnearest"))
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=2048,
                                        num_class=K)
    tmodel = mm.ClipWarpNet(_ref_encoder(), dec, torch.nn.NLLLoss(), args,
                            deep_sup_scale=0.4)
    _randomize(tmodel, seed=18)
    tmodel.eval()

    frames = _frames(3, seed=8)
    feed = {"img_data": frames[-1], "clipimgs_data": list(frames[:-1])}
    with torch.no_grad():
        ref_probs = tmodel(feed, segSize=(H, W))

    imported = import_clip_warp_state_dict(tmodel.state_dict())
    model = ClipWarpNet(encoder=_build_jax_encoder(), num_class=K,
                        fc_dim=2048, args=args)
    outs = model.apply(imported, _to_jax(frames), train=False)
    _probs_close(ref_probs, inference_probs(outs, (H, W)))


def test_propnet_numeric_parity():
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_propnet_state_dict)
    from cvpr2021_vspw_implement_tpu.models.propnet import PropNet
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)

    ref_pn = _ref_import("models.propnet")
    mm = _ref_import("models.models")
    args = _warp_args()
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=2048,
                                        num_class=K)
    tmodel = ref_pn.PropNet(_ref_encoder(), dec, torch.nn.NLLLoss(), args,
                            deep_sup_scale=0.4)
    _randomize(tmodel, seed=19)
    tmodel.eval()

    frames = _frames(3, seed=9)
    feed = {"img_data": frames[-1], "clipimgs_data": list(frames[:-1]),
            "seg_label": torch.zeros((B, 1, H, W))}
    with torch.no_grad():
        ref_probs = tmodel(feed, segSize=(H, W))

    imported = import_propnet_state_dict(tmodel.state_dict())
    model = PropNet(encoder=_build_jax_encoder(), num_class=K, fc_dim=2048,
                    args=args)
    outs = model.apply(imported, _to_jax(frames), train=False)
    _probs_close(ref_probs, inference_probs(outs, (H, W)))


def test_warp_merge_numeric_parity():
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_warp_merge_state_dict)
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)
    from cvpr2021_vspw_implement_tpu.models.warp_our_merge import OurWarpMerge

    ref_wm = _ref_import("models.warp_our_merge")
    mm = _ref_import("models.models")
    args = _warp_args()
    dec = mm.ModelBuilder.build_decoder("ppm_clip", fc_dim=2048, num_class=K)
    tmodel = ref_wm.OurWarpMerge(_ref_encoder(), dec, torch.nn.NLLLoss(),
                                 args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=20)
    tmodel.eval()

    frames = _frames(3, seed=10)
    feed = {"img_data": frames[-1], "clipimgs_data": list(frames[:-1]),
            "seg_label": torch.zeros((B, 1, H, W))}
    with torch.no_grad():
        ref_probs = tmodel(feed, segSize=(H, W))

    imported = import_warp_merge_state_dict(tmodel.state_dict())
    model = OurWarpMerge(encoder=_build_jax_encoder(), num_class=K,
                         fc_dim=2048, args=args)
    outs = model.apply(imported, _to_jax(frames), train=False)
    _probs_close(ref_probs, inference_probs(outs, (H, W)))


# --------------------------------------------------------------------------
# td4_psp — the reference's streaming eval branch is broken upstream
# (td4_psp.py:317-330 unpacks Encoding(pre=False) in swapped order), so
# parity is proven on the train-branch forward paths (dropout/BN in eval
# mode), for every pos_id, at the reference's align_corners=True upsampling.
# --------------------------------------------------------------------------

def test_td4_numeric_parity():
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_td4_state_dict)
    from cvpr2021_vspw_implement_tpu.models.td4_psp import TD4PSP
    from cvpr2021_vspw_implement_tpu.ops.interpolate import resize_bilinear

    ref_td4 = _ref_import("models.td4_psp.td4_psp")
    cropsize = H - 1  # int(cropsize/8)+1 == H/8 feature size
    args = argparse.Namespace(num_class=K, cropsize=cropsize, fix=False)
    torch.manual_seed(0)
    tmodel = ref_td4.td4_psp(args=args, backbone="resnet18", loss_fn=None)
    _randomize(tmodel, seed=21)
    tmodel.eval()

    frames = _frames(4, seed=11)
    imported = import_td4_state_dict(tmodel.state_dict())
    model = TD4PSP(num_class=K, cropsize=cropsize)

    fwd = [tmodel.forward_path1, tmodel.forward_path2,
           tmodel.forward_path3, tmodel.forward_path4]
    for pos_id in range(4):
        with torch.no_grad():
            ref_main, ref_sub, ref_aux = fwd[pos_id](list(frames))
        main, sub, aux = model.apply(imported, _to_jax(frames),
                                     pos_id=pos_id, train=False)
        for ours, ref in ((main, ref_main), (sub, ref_sub), (aux, ref_aux)):
            up = resize_bilinear(ours.astype(jnp.float32), (H, W),
                                 align_corners=True)
            np.testing.assert_allclose(
                np.asarray(up), ref.numpy().transpose(0, 2, 3, 1),
                rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------------------
# nonlocal3d
# --------------------------------------------------------------------------

def test_nonlocal3d_numeric_parity():
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_nonlocal3d_state_dict)
    from cvpr2021_vspw_implement_tpu.models.nonlocal3d import NonLocal3D
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)

    ref_nl = _ref_import("models.non_local_models")
    args = argparse.Namespace(num_class=K)
    tmodel = ref_nl.Non_local3d(args, _ref_encoder(), torch.nn.NLLLoss())
    _randomize(tmodel, seed=13)
    tmodel.eval()

    frames = _frames(4, seed=3)  # all frames, no target slot
    feed = {"clipimgs_data": list(frames),
            "cliplabels_data": [torch.zeros((B, 1, H, W))] * 4}
    with torch.no_grad():
        # reference returns a per-frame LIST of [B, K, H, W]
        ref_probs = torch.cat(tmodel(feed, segSize=(H, W)), dim=0)

    imported = import_nonlocal3d_state_dict(tmodel.state_dict())
    model = NonLocal3D(encoder=_build_jax_encoder(), num_class=K,
                       fc_dim=2048)
    logits = model.apply(imported, _to_jax(frames), train=False)
    t = logits.shape[0]
    probs = jnp.concatenate(
        [inference_probs((logits[i],), (H, W)) for i in range(t)], axis=0)
    _probs_close(ref_probs, probs)
