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
