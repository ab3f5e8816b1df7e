"""Seeded training-curve parity vs the reference torch pipeline.

From identical imported weights and identical batches, N full SGD steps of
the reference torch training loop (loss, backward, poly-LR SGD with the
reference's weight-decay groups — train.py:191-238 / train_clip2.py:215-252)
must produce the same per-step loss trajectory as our jitted train step,
for per-frame PSP and for clip_psp.

Dropout is deterministically disabled on BOTH sides (torch p=0; our
``set_dropout_override(0.0)``) — the two frameworks' dropout RNGs cannot be
matched, and everything else (BN batch stats, momentum, decay groups, poly
schedule, loss order) is exercised exactly.
"""

import argparse
import copy
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_fused_numeric import _randomize, _ref_import  # noqa: E402

REF = "/root/reference"
K = 5
LR, MOM, WD, MAX_ITERS, STEPS = 0.02, 0.9, 1e-4, 20, 3

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _zero_torch_dropout(model):
    for m in model.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0


def _poly(i):
    return (1.0 - i / MAX_ITERS) ** 0.9


@pytest.fixture()
def no_dropout():
    from cvpr2021_vspw_implement_tpu.models.layers import set_dropout_override
    set_dropout_override(0.0)
    yield
    set_dropout_override(None)


def _frame_batches(rng, n, b, h, w):
    out = []
    for _ in range(n):
        img = rng.standard_normal((b, h, w, 3)).astype(np.float32)
        lab = rng.integers(0, K, (b, h, w)).astype(np.int32)
        lab[:, 0, 0] = 255  # exercise ignore_index
        out.append((img, lab))
    return out


def test_frame_psp_curve_matches_reference(no_dropout):
    mm = _ref_import("models.models")
    torch.manual_seed(0)
    enc = mm.ModelBuilder.build_encoder("resnet18dilated", weights="")
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup", fc_dim=512,
                                        num_class=K, use_softmax=False)
    seg = mm.SegmentationModule(enc, dec,
                                torch.nn.NLLLoss(ignore_index=255),
                                deep_sup_scale=0.4)
    _randomize(seg, seed=61)
    _zero_torch_dropout(seg)
    seg.train()

    # reference per-frame recipe: two SGDs over group_weight splits
    # (kernels decay, BN/bias no-decay), shared poly LR (train.py:191-238)
    def group_weight(module):
        decay, no_decay = [], []
        for m in module.modules():
            if isinstance(m, (torch.nn.Linear, torch.nn.modules.conv._ConvNd)):
                decay.append(m.weight)
                if m.bias is not None:
                    no_decay.append(m.bias)
            elif isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
                if m.weight is not None:
                    no_decay.append(m.weight)
                if m.bias is not None:
                    no_decay.append(m.bias)
        assert len(list(module.parameters())) == len(decay) + len(no_decay)
        return [dict(params=decay),
                dict(params=no_decay, weight_decay=0.0)]

    opt_e = torch.optim.SGD(group_weight(enc), lr=LR, momentum=MOM,
                            weight_decay=WD)
    opt_d = torch.optim.SGD(group_weight(dec), lr=LR, momentum=MOM,
                            weight_decay=WD)

    rng = np.random.default_rng(62)
    batches = _frame_batches(rng, STEPS, 2, 48, 48)

    # snapshot BEFORE training: our side must start from the same init
    sd_enc0 = copy.deepcopy(enc.state_dict())
    sd_dec0 = copy.deepcopy(dec.state_dict())
    ref_losses = []
    for i, (img, lab) in enumerate(batches):
        for opt in (opt_e, opt_d):
            for g in opt.param_groups:
                g["lr"] = LR * _poly(i)
        feed = {"img_data": torch.from_numpy(img.transpose(0, 3, 1, 2)),
                "seg_label": torch.from_numpy(
                    lab.astype(np.float32))[:, None]}
        loss, _acc = seg(feed)
        opt_e.zero_grad(), opt_d.zero_grad()
        loss.backward()
        opt_e.step(), opt_d.step()
        ref_losses.append(float(loss))

    # ---------------- ours: same weights, same batches ----------------
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_ppm_decoder_state_dict, import_resnet_state_dict)
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        SegmentationModule)
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_frame_optimizer)

    enc_v = import_resnet_state_dict(sd_enc0)
    dec_v = import_ppm_decoder_state_dict(sd_dec0, deepsup=True)
    variables = {c: {"encoder": enc_v[c], "decoder": dec_v[c]}
                 for c in ("params", "batch_stats")}
    model = SegmentationModule(
        ModelBuilder.build_encoder("resnet18dilated"),
        ModelBuilder.build_decoder("ppm_deepsup", fc_dim=512, num_class=K))
    tx = create_frame_optimizer(variables["params"], lr=LR,
                                max_iters=MAX_ITERS, momentum=MOM,
                                weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, deep_sup_scale=0.4, donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for img, lab in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(img), "label": jnp.asarray(lab)}, key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4  # curve actually moves


def test_clip_psp_curve_matches_reference(no_dropout):
    ref_clip_psp = _ref_import("models.clip_psp")
    mm = _ref_import("models.models")
    args = argparse.Namespace(num_class=K, psp_weight=False)
    torch.manual_seed(1)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    tmodel = ref_clip_psp.Clip_PSP(enc, torch.nn.NLLLoss(ignore_index=255),
                                   args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=63)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    # clip recipe: one SGD over 1x/10x x decay/no-decay groups
    # (train_clip2.py:215-252)
    train_params = [
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ]
    opt = torch.optim.SGD(train_params, lr=LR, momentum=MOM,
                          weight_decay=WD)

    rng = np.random.default_rng(64)
    t1, b, hw = 3, 2, 48
    batches = []
    for _ in range(STEPS):
        imgs = rng.standard_normal((t1, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (t1, b, hw, hw)).astype(np.int32)
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())  # pre-training snapshot
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i * (0.1 if gi in (0, 2) else 1.0)
        # target LAST in our layout == reference img_data + clipimgs order
        feed = {
            "img_data": torch.from_numpy(
                imgs[-1].transpose(0, 3, 1, 2)),
            "clipimgs_data": [torch.from_numpy(f.transpose(0, 3, 1, 2))
                              for f in imgs[:-1]],
            "seg_label": torch.from_numpy(
                labs[-1].astype(np.float32))[:, None],
            "cliplabels_data": [torch.from_numpy(
                l.astype(np.float32))[:, None] for l in labs[:-1]],
        }
        loss, _acc = tmodel(feed)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import (
        ClipPSP, clip_psp_loss)
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_clip_psp_state_dict)
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    variables = import_clip_psp_state_dict(sd0)
    model = ClipPSP(encoder=ModelBuilder.build_encoder("resnet50dilated"),
                    num_class=K, fc_dim=2048)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, loss_fn=clip_psp_loss, donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, labs in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_netwarp_curve_matches_reference(no_dropout, tmp_path, monkeypatch):
    """NetWarp: frozen-RAFT flow inside the step, FlowCNN refinement, warped
    blends, 4-group SGD (RAFT excluded from every group, reference
    netwarp.py:116-149) — the per-step losses must track the reference."""
    from test_fused_numeric import (_build_jax_encoder, _ref_encoder,
                                    _stage_raft_ckpt)

    _stage_raft_ckpt(tmp_path, monkeypatch)
    ref_nw = _ref_import("models.netwarp")
    mm = _ref_import("models.models")
    args = argparse.Namespace(num_class=K, clip_num=2)
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=2048,
                                        num_class=K)
    tmodel = ref_nw.NetWarp(_ref_encoder(), dec,
                            torch.nn.NLLLoss(ignore_index=255), args,
                            deep_sup_scale=0.4)
    _randomize(tmodel, seed=65)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    train_params = [
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ]
    opt = torch.optim.SGD(train_params, lr=LR, momentum=MOM,
                          weight_decay=WD)

    rng = np.random.default_rng(66)
    b, hw = 2, 128  # RAFT pyramid needs >=2x2 at H/64
    batches = []
    for _ in range(STEPS):
        imgs = rng.standard_normal((2, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (2, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255  # exercise ignore_index
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())  # pre-training snapshot
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i * (0.1 if gi in (0, 2) else 1.0)
        feed = {
            "img_data": torch.from_numpy(imgs[-1].transpose(0, 3, 1, 2)),
            "clipimgs_data": [torch.from_numpy(
                imgs[0].transpose(0, 3, 1, 2))],
            "seg_label": torch.from_numpy(
                labs[-1].astype(np.float32))[:, None],
        }
        loss, _acc = tmodel(feed)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_netwarp_state_dict)
    from cvpr2021_vspw_implement_tpu.models.netwarp import (
        NetWarp, netwarp_loss)
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    variables = import_netwarp_state_dict(sd0)
    model = NetWarp(encoder=_build_jax_encoder(), num_class=K, fc_dim=2048,
                    raft_iters=20)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, loss_fn=netwarp_loss, donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, labs in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_etc_curve_matches_reference(no_dropout, tmp_path, monkeypatch):
    """ETC: frozen-RAFT flow, ST-consistency MSE with the occlusion mask,
    two-frame batch-concat forward (reference ETC.py:120-181)."""
    from functools import partial

    from test_fused_numeric import (_build_jax_encoder, _ref_encoder,
                                    _stage_raft_ckpt)

    _stage_raft_ckpt(tmp_path, monkeypatch)
    ref_etc = _ref_import("models.ETC")
    mm = _ref_import("models.models")
    args = argparse.Namespace(num_class=K, clip_num=2, dilation_num=0,
                              st_weight=1.0)
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=2048,
                                        num_class=K)
    tmodel = ref_etc.ETC(_ref_encoder(), dec,
                         torch.nn.NLLLoss(ignore_index=255), args,
                         deep_sup_scale=0.4)
    _randomize(tmodel, seed=67)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    train_params = [
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ]
    opt = torch.optim.SGD(train_params, lr=LR, momentum=MOM,
                          weight_decay=WD)

    rng = np.random.default_rng(68)
    b, hw = 2, 128
    batches = []
    for _ in range(STEPS):
        imgs = rng.standard_normal((2, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (2, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())  # pre-training snapshot
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i * (0.1 if gi in (0, 2) else 1.0)
        feed = {
            "img_data": torch.from_numpy(imgs[-1].transpose(0, 3, 1, 2)),
            "clipimgs_data": [torch.from_numpy(
                imgs[0].transpose(0, 3, 1, 2))],
            "seg_label": torch.from_numpy(
                labs[-1].astype(np.float32))[:, None],
        }
        loss, _acc = tmodel(feed)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models.etc import ETC, etc_loss
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_etc_state_dict)
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    variables = import_etc_state_dict(sd0)
    model = ETC(encoder=_build_jax_encoder(), num_class=K, fc_dim=2048)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx,
                              loss_fn=partial(etc_loss, st_weight=1.0),
                              donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, labs in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_our_warp_curve_matches_reference(no_dropout):
    """ClipWarpNet (our_warp, distsoftmax + allsup): local cost volumes,
    temperature-softmax label propagation, allsup+deepsup loss chain
    (reference models/models.py:183-267)."""
    import argparse as _ap
    from functools import partial

    from test_fused_numeric import _build_jax_encoder, _ref_encoder

    mm = _ref_import("models.models")
    args = _ap.Namespace(num_class=K, clip_num=3, fix=False,
                         max_distances=[2], linear_combine=False,
                         distsoftmax=True, distnearest=False, temp=3.0,
                         allsup=True, allsup_scale=0.3)
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup_clip", fc_dim=2048,
                                        num_class=K)
    tmodel = mm.ClipWarpNet(_ref_encoder(), dec,
                            torch.nn.NLLLoss(ignore_index=255), args,
                            deep_sup_scale=0.4)
    _randomize(tmodel, seed=69)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    train_params = [
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ]
    opt = torch.optim.SGD(train_params, lr=LR, momentum=MOM,
                          weight_decay=WD)

    rng = np.random.default_rng(70)
    t1, b, hw = 3, 2, 48
    batches = []
    for _ in range(STEPS):
        imgs = rng.standard_normal((t1, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (t1, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())  # pre-training snapshot
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i * (0.1 if gi in (0, 2) else 1.0)
        feed = {
            "img_data": torch.from_numpy(imgs[-1].transpose(0, 3, 1, 2)),
            "clipimgs_data": [torch.from_numpy(f.transpose(0, 3, 1, 2))
                              for f in imgs[:-1]],
            "seg_label": torch.from_numpy(
                labs[-1].astype(np.float32))[:, None],
            "cliplabels_data": [torch.from_numpy(
                l.astype(np.float32))[:, None] for l in labs[:-1]],
        }
        loss, _acc = tmodel(feed)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_clip_warp_state_dict)
    from cvpr2021_vspw_implement_tpu.models.warp_our import (
        ClipWarpNet, clip_warp_loss)
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    variables = import_clip_warp_state_dict(sd0)
    model = ClipWarpNet(encoder=_build_jax_encoder(), num_class=K,
                        fc_dim=2048, args=args)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(
        model, tx,
        loss_fn=partial(clip_warp_loss, allsup=True, allsup_scale=0.3),
        donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, labs in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def _warp_family_curve(ref_module, ref_cls_name, dec_arch, import_fn_name,
                       our_module, our_cls_name, our_loss_name, seed,
                       loss_kwargs=None):
    """Shared harness: 3 seeded SGD steps of a reference warp-family model
    vs our jitted step (same template as the named tests above)."""
    import argparse as _ap
    import importlib
    from functools import partial

    from test_fused_numeric import _build_jax_encoder, _ref_encoder

    ref_mod = _ref_import(ref_module)
    mm = _ref_import("models.models")
    args = _ap.Namespace(num_class=K, clip_num=3, fix=False,
                         max_distances=[2], linear_combine=False,
                         distsoftmax=False, distnearest=False, temp=3.0,
                         allsup=False, allsup_scale=0.3)  # CLI default
    dec = mm.ModelBuilder.build_decoder(dec_arch, fc_dim=2048, num_class=K)
    tmodel = getattr(ref_mod, ref_cls_name)(
        _ref_encoder(), dec, torch.nn.NLLLoss(ignore_index=255), args,
        deep_sup_scale=0.4)
    _randomize(tmodel, seed=seed)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    opt = torch.optim.SGD([
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ], lr=LR, momentum=MOM, weight_decay=WD)

    rng = np.random.default_rng(seed + 1)
    t1, b, hw = 3, 2, 48
    batches = []
    for _ in range(STEPS):
        imgs = rng.standard_normal((t1, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (t1, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())  # pre-training snapshot
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i * (0.1 if gi in (0, 2) else 1.0)
        feed = {
            "img_data": torch.from_numpy(imgs[-1].transpose(0, 3, 1, 2)),
            "clipimgs_data": [torch.from_numpy(f.transpose(0, 3, 1, 2))
                              for f in imgs[:-1]],
            "seg_label": torch.from_numpy(
                labs[-1].astype(np.float32))[:, None],
            "cliplabels_data": [torch.from_numpy(
                l.astype(np.float32))[:, None] for l in labs[:-1]],
        }
        loss, _acc = tmodel(feed)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models import import_torch as it
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    mod = importlib.import_module(
        f"cvpr2021_vspw_implement_tpu.models.{our_module}")
    variables = getattr(it, import_fn_name)(sd0)
    model = getattr(mod, our_cls_name)(encoder=_build_jax_encoder(),
                                       num_class=K, fc_dim=2048, args=args)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD)
    state = TrainState.create(variables, tx)
    loss_fn = getattr(mod, our_loss_name)
    if loss_kwargs:
        loss_fn = partial(loss_fn, **loss_kwargs)
    step_fn = make_train_step(model, tx, loss_fn=loss_fn, donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, labs in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_propnet_curve_matches_reference(no_dropout):
    """PropNet: per-step propagation losses averaged + allsup/deepsup term
    (reference propnet.py:176-237)."""
    _warp_family_curve("models.propnet", "PropNet", "ppm_deepsup_clip",
                       "import_propnet_state_dict", "propnet", "PropNet",
                       "propnet_loss", seed=73)


def test_warp_merge_curve_matches_reference(no_dropout):
    """OurWarpMerge: merged cost-volume propagation, (allsup+deepsup)*scale
    chain (reference warp_our_merge.py:68-108)."""
    _warp_family_curve("models.warp_our_merge", "OurWarpMerge", "ppm_clip",
                       "import_warp_merge_state_dict", "warp_our_merge",
                       "OurWarpMerge", "warp_merge_loss", seed=75)


def test_clip_ocr_curve_matches_reference(no_dropout):
    """TCB-OCR: SpatialTemporalGather context over the clip, OCR attention,
    dsn deep supervision on the target frame (reference clip_ocr.py:106-205)."""
    import argparse as _ap

    from test_fused_numeric import _build_jax_encoder, _ref_encoder

    ref_clip_ocr = _ref_import("models.clip_ocr")
    args = _ap.Namespace(num_class=K, use_memory=False, clipocr_all=False)
    tmodel = ref_clip_ocr.ClipOCRNet(_ref_encoder(),
                                     torch.nn.NLLLoss(ignore_index=255),
                                     args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=77)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    opt = torch.optim.SGD([
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ], lr=LR, momentum=MOM, weight_decay=WD)

    rng = np.random.default_rng(78)
    t1, b, hw = 4, 2, 48
    batches = []
    for _ in range(STEPS):
        imgs = rng.standard_normal((t1, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (t1, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())  # pre-training snapshot
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i * (0.1 if gi in (0, 2) else 1.0)
        feed = {
            "img_data": torch.from_numpy(imgs[-1].transpose(0, 3, 1, 2)),
            "clipimgs_data": [torch.from_numpy(f.transpose(0, 3, 1, 2))
                              for f in imgs[:-1]],
            "seg_label": torch.from_numpy(
                labs[-1].astype(np.float32))[:, None],
            "cliplabels_data": [torch.from_numpy(
                l.astype(np.float32))[:, None] for l in labs[:-1]],
        }
        loss, _acc = tmodel(feed)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models.clip_ocr import (
        ClipOCRNet, clip_ocr_loss)
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_clip_ocr_state_dict)
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    variables = import_clip_ocr_state_dict(sd0)
    model = ClipOCRNet(encoder=_build_jax_encoder(), num_class=K)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, loss_fn=clip_ocr_loss, donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, labs in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_td4_curve_matches_reference(no_dropout):
    """TDNet td4_psp: rotating 4-path forward (pos_id = step % 4), sliced
    PSP + attention chain, OHEM main+0.5*sub+0.1*aux loss (reference
    td4_psp.py:552-577, train_clip2.py:94,263-267)."""
    import argparse as _ap

    ref_td4 = _ref_import("models.td4_psp.td4_psp")
    ref_loss = _ref_import("models.td4_psp.loss")

    hw = 48
    cropsize = hw - 1  # int(cropsize/8)+1 == hw/8 feature size
    b = 2
    # match our td4_loss's n_min (computed from the actual label size)
    n_min = b * hw * hw // 16
    args = _ap.Namespace(num_class=K, cropsize=cropsize, fix=False)
    torch.manual_seed(0)
    loss_fn_t = ref_loss.OhemCELoss2D(thresh=0.7, n_min=n_min,
                                      ignore_index=255)
    tmodel = ref_td4.td4_psp(args=args, backbone="resnet18",
                             loss_fn=loss_fn_t)
    _randomize(tmodel, seed=79)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    opt = torch.optim.SGD([
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ], lr=LR, momentum=MOM, weight_decay=WD)

    rng = np.random.default_rng(80)
    batches = []
    for _ in range(4):  # one step per path
        imgs = rng.standard_normal((4, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (4, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())  # pre-training snapshot
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i * (0.1 if gi in (0, 2) else 1.0)
        feed = {
            "clipimgs_data": [torch.from_numpy(f.transpose(0, 3, 1, 2))
                              for f in imgs],
            "cliplabels_data": [torch.from_numpy(
                l.astype(np.float32))[:, None] for l in labs],
        }
        loss, _acc = tmodel(feed, pos_id=i % 4)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_td4_state_dict)
    from cvpr2021_vspw_implement_tpu.models.td4_psp import TD4PSP, td4_loss
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    variables = import_td4_state_dict(sd0)
    model = TD4PSP(num_class=K, cropsize=cropsize)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, loss_fn=td4_loss, donate=False,
                              static_kwarg="pos_id")

    key = jax.random.PRNGKey(0)
    our_losses = []
    for i, (imgs, labs) in enumerate(batches):
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key, i % 4)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_nonlocal3d_curve_matches_reference(no_dropout):
    """Non_local3d: 3D non-local block over the clip, mean of per-frame
    NLLs (reference non_local_models.py:19-62)."""
    import argparse as _ap

    from test_fused_numeric import _build_jax_encoder, _ref_encoder

    ref_nl = _ref_import("models.non_local_models")
    args = _ap.Namespace(num_class=K)
    tmodel = ref_nl.Non_local3d(args, _ref_encoder(),
                                torch.nn.NLLLoss(ignore_index=255))
    _randomize(tmodel, seed=81)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    opt = torch.optim.SGD([
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ], lr=LR, momentum=MOM, weight_decay=WD)

    rng = np.random.default_rng(82)
    t, b, hw = 3, 2, 48
    batches = []
    for _ in range(STEPS):
        imgs = rng.standard_normal((t, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (t, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())  # pre-training snapshot
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i * (0.1 if gi in (0, 2) else 1.0)
        feed = {
            "clipimgs_data": [torch.from_numpy(f.transpose(0, 3, 1, 2))
                              for f in imgs],
            "cliplabels_data": [torch.from_numpy(
                l.astype(np.float32))[:, None] for l in labs],
        }
        loss, _acc = tmodel(feed)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_nonlocal3d_state_dict)
    from cvpr2021_vspw_implement_tpu.models.nonlocal3d import (
        NonLocal3D, nonlocal3d_loss)
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    variables = import_nonlocal3d_state_dict(sd0)
    model = NonLocal3D(encoder=_build_jax_encoder(), num_class=K)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, loss_fn=nonlocal3d_loss,
                              donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, labs in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def _ocr_variant_curve(ref_module, ref_cls_name, our_module, our_cls_name,
                       our_loss_name, seed, tmp_path, monkeypatch,
                       extra_args=None, loss_kwargs=None):
    """Shared harness for the OCR flow-method variants (netwarp_ocr /
    etc_ocr): frozen-RAFT flow, OCR head with dsn deep supervision over the
    concatenated [prev, target] labels (reference quirk kept)."""
    import argparse as _ap
    import importlib
    from functools import partial

    from test_fused_numeric import (_build_jax_encoder, _ref_encoder,
                                    _stage_raft_ckpt)

    _stage_raft_ckpt(tmp_path, monkeypatch)
    ref_mod = _ref_import(ref_module)
    args = _ap.Namespace(num_class=K, clip_num=2, **(extra_args or {}))
    tmodel = getattr(ref_mod, ref_cls_name)(
        _ref_encoder(), torch.nn.NLLLoss(ignore_index=255), args,
        deep_sup_scale=0.4)
    _randomize(tmodel, seed=seed)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    opt = torch.optim.SGD([
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ], lr=LR, momentum=MOM, weight_decay=WD)

    rng = np.random.default_rng(seed + 1)
    b, hw = 2, 128  # RAFT pyramid needs >=2x2 at H/64
    batches = []
    for _ in range(STEPS):
        imgs = rng.standard_normal((2, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (2, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i * (0.1 if gi in (0, 2) else 1.0)
        feed = {
            "img_data": torch.from_numpy(imgs[-1].transpose(0, 3, 1, 2)),
            "clipimgs_data": [torch.from_numpy(
                imgs[0].transpose(0, 3, 1, 2))],
            "seg_label": torch.from_numpy(
                labs[-1].astype(np.float32))[:, None],
            "cliplabels_data": [torch.from_numpy(
                labs[0].astype(np.float32))[:, None]],
        }
        loss, _acc = tmodel(feed)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models import import_torch as it
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    mod = importlib.import_module(
        f"cvpr2021_vspw_implement_tpu.models.{our_module}")
    if our_module == "netwarp":
        variables = it.import_netwarp_state_dict(sd0, ocr=True)
        model = mod.NetWarp(encoder=_build_jax_encoder(), num_class=K,
                            fc_dim=2048, ocr=True, raft_iters=20)
    else:
        variables = it.import_etc_state_dict(sd0, ocr=True)
        model = mod.ETC(encoder=_build_jax_encoder(), num_class=K,
                        fc_dim=2048, ocr=True)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD)
    state = TrainState.create(variables, tx)
    loss_fn = partial(getattr(mod, our_loss_name), ocr=True,
                      **(loss_kwargs or {}))
    step_fn = make_train_step(model, tx, loss_fn=loss_fn, donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, labs in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_netwarp_ocr_curve_matches_reference(no_dropout, tmp_path,
                                             monkeypatch):
    _ocr_variant_curve("models.netwarp_ocr", "NetWarp_ocr", "netwarp",
                       "NetWarp", "netwarp_loss", 83, tmp_path, monkeypatch)


def test_etc_ocr_curve_matches_reference(no_dropout, tmp_path, monkeypatch):
    _ocr_variant_curve("models.ETC_ocr", "ETC_ocr", "etc", "ETC",
                       "etc_loss", 85, tmp_path, monkeypatch,
                       extra_args={"dilation_num": 0, "st_weight": 1.0},
                       loss_kwargs={"st_weight": 1.0})


def test_biconvlstm_allclip_curve_matches_reference(no_dropout):
    """SegmentationModule_allclip (BiConvLSTM head, fix=True — the only
    branch that runs upstream; non-fix references an undefined loss1):
    frozen HRNet embeddings, gradients through the shared-cell
    bidirectional ConvLSTM recurrence, mean per-frame NLL
    (reference models/models.py:345-447)."""
    import argparse as _ap

    mm = _ref_import("models.models")
    t, b, hw = 3, 2, 64
    args = _ap.Namespace(num_class=K, convlstm=True, non_local=False,
                         fix=True)
    torch.manual_seed(3)
    enc = mm.ModelBuilder.build_encoder("hrnetv2", fc_dim=720, weights="")
    dec = mm.ModelBuilder.build_decoder("c1", fc_dim=720, num_class=K,
                                        use_softmax=False)
    tmodel = mm.SegmentationModule_allclip(
        enc, dec, torch.nn.NLLLoss(ignore_index=255), args,
        inputsize=(hw // 4, hw // 4))
    # reference _init_hidden hardcodes .cuda() (BiConvLSTM.py:139-144)
    cl = tmodel.prop_clip.convlstm
    cl._init_hidden = lambda batch_size, cuda: [
        (torch.zeros(batch_size, d, hw // 4, hw // 4),
         torch.zeros(batch_size, d, hw // 4, hw // 4))
        for d in cl.hidden_dim]
    _randomize(tmodel, seed=87)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    # The reference's group generators yield each param once per ancestor
    # module (named_modules x named_parameters), and torch double-applies
    # duplicates.  For every DRIVER-trained method the duplication shifts
    # the loss <0.1% over 3 steps (verified for clip_psp) and the curve
    # tests compare against the quirk as-is; allclip's head is ~3.5x
    # duplicated and no reference driver ever builds this optimizer, so
    # here we pin against the deduplicated groups (the intended recipe).
    def dedup(gen):
        seen, out = set(), []
        for q in gen:
            if id(q) not in seen:
                seen.add(id(q))
                out.append(q)
        return out

    groups = [
        {"params": dedup(tmodel.get_1x_lr_params()), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": dedup(tmodel.get_10x_lr_params()), "lr": LR,
         "weight_decay": WD},
        {"params": dedup(tmodel.get_1x_lr_params_bias()), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": dedup(tmodel.get_10x_lr_params_bias()), "lr": LR,
         "weight_decay": 0},
    ]
    opt = torch.optim.SGD([g for g in groups if g["params"]], lr=LR,
                          momentum=MOM, weight_decay=WD)

    rng = np.random.default_rng(88)
    batches = []
    for _ in range(STEPS):
        imgs = rng.standard_normal((t, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (t, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255
        batches.append((imgs, labs))

    sd_enc0 = copy.deepcopy(enc.state_dict())
    sd_head0 = copy.deepcopy(tmodel.prop_clip.state_dict())
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * _poly(i)
        for gi, g in enumerate(opt.param_groups):
            g["lr"] = lr_i  # fix=True: only 10x groups survive, lr 1x
        feed = {
            "clipimgs_data": [torch.from_numpy(f.transpose(0, 3, 1, 2))
                              for f in imgs],
            "seg_label": torch.from_numpy(
                labs[-1].astype(np.float32))[:, None],
            "cliplabels_data": [torch.from_numpy(
                l.astype(np.float32))[:, None] for l in labs],
        }
        loss, _acc = tmodel(feed)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    from cvpr2021_vspw_implement_tpu.models.biconvlstm import (
        SegmentationModuleAllClip, allclip_loss)
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_convlstm_head_state_dict, import_hrnet_state_dict)
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    enc_v = import_hrnet_state_dict(sd_enc0)
    head_v = import_convlstm_head_state_dict(sd_head0)
    variables = {
        "params": {"encoder": enc_v["params"],
                   "prop_clip": head_v["params"]},
        "batch_stats": {"encoder": enc_v["batch_stats"]},
    }
    model = SegmentationModuleAllClip(
        encoder=ModelBuilder.build_encoder("hrnetv2"), num_class=K)
    tx = create_clip_optimizer(variables["params"], lr=LR,
                               max_iters=MAX_ITERS, momentum=MOM,
                               weight_decay=WD, fix_encoder=True)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, loss_fn=allclip_loss, donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for imgs, labs in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(imgs), "labels": jnp.asarray(labs)},
            key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4
