"""Training-loss parity vs torch: the reference upsamples LOG-PROBS
(log_softmax in-decoder, bilinear interpolate, NLL) — verify our loss
reproduces that exact pipeline including deep supervision weighting."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.segmentation import (
    segmentation_loss, upsampled_logprob_loss)

RNG = np.random.default_rng(0)


def torch_ref_loss(logits, label, deepsup=None, scale=0.4):
    crit = torch.nn.NLLLoss(ignore_index=255)

    def one(lg):
        t = torch.from_numpy(lg.transpose(0, 3, 1, 2))
        lp = F.log_softmax(t, dim=1)
        lp = F.interpolate(lp, label.shape[1:3], mode="bilinear",
                           align_corners=False)
        return crit(lp, torch.from_numpy(label).long())

    loss = one(logits)
    if deepsup is not None:
        loss = loss + scale * one(deepsup)
    return float(loss)


def test_segmentation_loss_matches_reference_order():
    logits = RNG.standard_normal((2, 6, 7, 5), np.float32) * 2
    deepsup = RNG.standard_normal((2, 6, 7, 5), np.float32) * 2
    label = RNG.integers(0, 5, (2, 24, 28)).astype(np.int32)
    label[0, :3] = 255

    loss, acc = segmentation_loss((jnp.asarray(logits), jnp.asarray(deepsup)),
                                  jnp.asarray(label), deep_sup_scale=0.4)
    ref = torch_ref_loss(logits, label, deepsup, 0.4)
    assert float(loss) == pytest.approx(ref, rel=1e-4)

    # and the no-deepsup path
    loss1, _ = segmentation_loss((jnp.asarray(logits),), jnp.asarray(label),
                                 deep_sup_scale=None)
    assert float(loss1) == pytest.approx(torch_ref_loss(logits, label),
                                         rel=1e-4)


def test_order_matters():
    """Sanity: resize-then-logsoftmax differs from the reference order —
    guarding against regressing to the naive formulation."""
    logits = RNG.standard_normal((1, 4, 4, 5), np.float32) * 3
    label = RNG.integers(0, 5, (1, 16, 16)).astype(np.int32)
    ref_order = float(upsampled_logprob_loss(jnp.asarray(logits),
                                             jnp.asarray(label)))
    from cvpr2021_vspw_implement_tpu.models.segmentation import nll_loss
    from cvpr2021_vspw_implement_tpu.ops.interpolate import resize_bilinear
    naive = float(nll_loss(resize_bilinear(jnp.asarray(logits), (16, 16)),
                           jnp.asarray(label)))
    assert ref_order != pytest.approx(naive, abs=1e-6)


def test_projected_deepsup_loss_equals_resize_then_pick():
    """upsampled_logprob_loss_projected == upsampled_logprob_loss exactly
    (transpose trick over the separable resize), values AND gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        upsampled_logprob_loss, upsampled_logprob_loss_projected)

    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.standard_normal((3, 7, 9, 6)).astype(np.float32))
    label = rng.integers(0, 6, (3, 52, 68)).astype(np.int32)
    label[0, :5] = 255  # ignore region
    label = jnp.asarray(label)

    want = upsampled_logprob_loss(logits, label)
    got = upsampled_logprob_loss_projected(logits, label)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    g_want = jax.grad(lambda l: upsampled_logprob_loss(l, label))(logits)
    g_got = jax.grad(
        lambda l: upsampled_logprob_loss_projected(l, label))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=1e-6, rtol=1e-5)
