"""Numeric parity for the allclip temporal heads vs the reference torch
modules (Conv_LSTM_Model / Non_local, models/models.py:283-341) — the last
method family that previously had only contract tests.

The encoder side of SegmentationModule_allclip is the plain HRNet trunk
(covered by the HRNet importer oracle tests); these tests pin the temporal
heads bit-for-bit from imported weights.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_fused_numeric import _randomize, _ref_import  # noqa: E402

REF = "/root/reference"
K = 5

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def test_convlstm_head_numeric_parity():
    from cvpr2021_vspw_implement_tpu.models.biconvlstm import ConvLSTMModel
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_convlstm_head_state_dict)

    mm = _ref_import("models.models")
    import argparse
    args = argparse.Namespace(num_class=K)
    t, b, h, w = 3, 2, 8, 8
    torch.manual_seed(0)
    tmodel = mm.Conv_LSTM_Model(args, (h, w))
    # the reference _init_hidden hardcodes .cuda() (BiConvLSTM.py:139-144);
    # zero-init on CPU is semantically identical
    tmodel.convlstm._init_hidden = lambda batch_size, cuda: [
        (torch.zeros(batch_size, d, h, w), torch.zeros(batch_size, d, h, w))
        for d in tmodel.convlstm.hidden_dim]
    _randomize(tmodel, seed=31)
    tmodel.eval()

    rng = np.random.default_rng(32)
    feats = rng.standard_normal((t, b, h, w, 720)).astype(np.float32)
    with torch.no_grad():
        ref_outs = tmodel([torch.from_numpy(f.transpose(0, 3, 1, 2))
                           for f in feats])

    imported = import_convlstm_head_state_dict(tmodel.state_dict())
    model = ConvLSTMModel(num_class=K)
    ours = model.apply(imported, jnp.asarray(feats), train=False)

    assert ours.shape == (t, b, h, w, K)
    for f in range(t):
        np.testing.assert_allclose(
            np.asarray(ours[f]),
            ref_outs[f].numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)


def test_nonlocal_clip_head_numeric_parity():
    from cvpr2021_vspw_implement_tpu.models.biconvlstm import (
        NonLocalClipHead)
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_nonlocal_clip_head_state_dict)

    mm = _ref_import("models.models")
    import argparse
    args = argparse.Namespace(num_class=K)
    t, b, h, w = 3, 2, 8, 8
    torch.manual_seed(1)
    tmodel = mm.Non_local(args)
    _randomize(tmodel, seed=33)
    tmodel.eval()

    rng = np.random.default_rng(34)
    feats = rng.standard_normal((t, b, h, w, 720)).astype(np.float32)
    with torch.no_grad():
        ref_outs = tmodel([torch.from_numpy(f.transpose(0, 3, 1, 2))
                           for f in feats])

    imported = import_nonlocal_clip_head_state_dict(tmodel.state_dict())
    model = NonLocalClipHead(num_class=K)
    ours = model.apply(imported, jnp.asarray(feats), train=False)

    assert ours.shape == (t, b, h, w, K)
    for f in range(t):
        np.testing.assert_allclose(
            np.asarray(ours[f]),
            ref_outs[f].numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)


def test_hrnet_clip_numeric_parity():
    """HRNetV2_clip encoder: frozen-stem context path + TimeAtten early
    fusion (reference hrnet_clip.py:438-475) — forward parity from imported
    weights.  (No reference driver instantiates SegmentationModule_clip, so
    the encoder forward is the whole trainable surface.)"""
    import argparse

    from cvpr2021_vspw_implement_tpu.models.hrnet_clip import HRNetV2Clip
    from cvpr2021_vspw_implement_tpu.models.import_torch import (
        import_hrnet_clip_state_dict)

    ref_hc = _ref_import("models.hrnet_clip")
    args = argparse.Namespace(clip_middle=True, clip_up=False)
    torch.manual_seed(2)
    tmodel = ref_hc.HRNetV2_clip(n_class=1000, args=args)
    _randomize(tmodel, seed=35)
    tmodel.eval()

    t, b, h, w = 2, 1, 64, 64
    rng = np.random.default_rng(36)
    c_img = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    clips = rng.standard_normal((t, b, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(c_img.transpose(0, 3, 1, 2)),
                         [torch.from_numpy(f.transpose(0, 3, 1, 2))
                          for f in clips], is_train=False)

    imported = import_hrnet_clip_state_dict(tmodel.state_dict())
    model = HRNetV2Clip(args=args)
    (ours,) = model.apply(imported, jnp.asarray(c_img), jnp.asarray(clips),
                          train=False)

    ref_np = (ref_out[0] if isinstance(ref_out, (list, tuple))
              else ref_out).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref_np.shape
    np.testing.assert_allclose(np.asarray(ours), ref_np,
                               rtol=1e-3, atol=1e-3)
