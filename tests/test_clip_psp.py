"""TCB-PSP (ClipPSP) contract tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP, clip_psp_loss

KEY = jax.random.PRNGKey(0)


def _model(psp_weight=False):
    enc = ModelBuilder.build_encoder("resnet18dilated")
    return ClipPSP(encoder=enc, num_class=7, fc_dim=512, psp_weight=psp_weight)


@pytest.mark.parametrize("psp_weight", [False, True])
def test_clip_psp_shapes_and_loss(psp_weight):
    model = _model(psp_weight)
    rng = np.random.default_rng(0)
    t1, b, h, w = 3, 2, 32, 32
    imgs = jnp.asarray(rng.standard_normal((t1, b, h, w, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 7, (t1, b, h, w)), jnp.int32)

    variables = model.init({"params": KEY, "dropout": KEY}, imgs, train=True)
    outs, _ = model.apply(variables, imgs, train=True,
                          mutable=["batch_stats"], rngs={"dropout": KEY})
    main, deepsup = outs
    assert main.shape == (b, h // 8, w // 8, 7)       # target frame only
    assert deepsup.shape == (t1 * b, h // 8, w // 8, 7)  # all frames

    loss, acc = clip_psp_loss(outs, {"labels": labels})
    assert np.isfinite(float(loss))
    assert 0 <= float(acc) <= 1

    # inference: single logits for the target frame
    eval_outs = model.apply(variables, imgs, train=False)
    assert len(eval_outs) == 1 and eval_outs[0].shape == main.shape


def test_clip_psp_blend_uses_context_frames():
    """Changing only a context frame must change the target prediction."""
    model = _model()
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((3, 1, 32, 32, 3), dtype=np.float32))
    variables = model.init({"params": KEY, "dropout": KEY}, imgs, train=True)
    out1 = model.apply(variables, imgs, train=False)[0]
    imgs2 = imgs.at[0].add(1.0)  # perturb a context frame only
    out2 = model.apply(variables, imgs2, train=False)[0]
    assert float(jnp.abs(out1 - out2).max()) > 1e-6
