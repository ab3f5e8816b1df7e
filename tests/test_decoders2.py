"""Shape/contract tests for OCR, DeepLab and non-local decoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.models import ModelBuilder
from cvpr2021_vspw_implement_tpu.models.ocr import (
    spatial_gather, spatial_temporal_gather)

KEY = jax.random.PRNGKey(0)

CONV_OUT = [jnp.ones((2, 16, 16, 256)), jnp.ones((2, 8, 8, 512)),
            jnp.ones((2, 8, 8, 1024)), jnp.ones((2, 8, 8, 2048))]


def _run(dec, conv_out, train):
    variables = dec.init({"params": KEY, "dropout": KEY}, conv_out, train=train)
    return dec.apply(variables, conv_out, train=train,
                     mutable=["batch_stats"] if train else False,
                     rngs={"dropout": KEY} if train else None)


def test_spatial_gather_weighted_average():
    # uniform logits → context = per-class plain average of features
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, 8),
                                                                 np.float32))
    probs = jnp.zeros((1, 4, 4, 3))
    ctx = spatial_gather(feats, probs)
    assert ctx.shape == (1, 3, 8)
    mean = feats.reshape(1, 16, 8).mean(axis=1)
    np.testing.assert_allclose(np.asarray(ctx[0, 0]), np.asarray(mean[0]),
                               rtol=1e-5)


def test_spatial_temporal_gather_mean_and_max():
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((6, 4, 4, 8), np.float32))  # 3 frames x B=2
    probs = jnp.asarray(rng.standard_normal((6, 4, 4, 5), np.float32))
    ctx_mean = spatial_temporal_gather(feats, probs, clip_num=2)
    ctx_max = spatial_temporal_gather(feats, probs, clip_num=2, reduce="max")
    assert ctx_mean.shape == (2, 5, 8)
    per_frame = [spatial_gather(feats[i * 2:(i + 1) * 2],
                                probs[i * 2:(i + 1) * 2]) for i in range(3)]
    np.testing.assert_allclose(np.asarray(ctx_mean),
                               np.mean([np.asarray(p) for p in per_frame], 0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx_max),
                               np.max([np.asarray(p) for p in per_frame], 0),
                               rtol=1e-5)


def test_ocr_decoder():
    dec = ModelBuilder.build_decoder("ocrnet_deepsup", fc_dim=2048, num_class=7)
    out, _ = _run(dec, CONV_OUT, True)
    x, dsn = out
    assert x.shape == (2, 8, 8, 7)
    assert dsn.shape == (2, 8, 8, 7)
    out_eval = _run(dec, CONV_OUT, False)
    assert len(out_eval) == 1


def test_deeplab_decoder():
    dec = ModelBuilder.build_decoder("deeplab", fc_dim=2048, num_class=7)
    out, _ = _run(dec, CONV_OUT, True)
    assert out[0].shape == (2, 16, 16, 7)  # at C2 (low-level) resolution


def test_nonlocal2d_decoder():
    dec = ModelBuilder.build_decoder("nonlocal2d", fc_dim=2048, num_class=7)
    out, _ = _run(dec, CONV_OUT, True)
    assert out[0].shape == (2, 8, 8, 7)


def test_nlblock_identity_at_init():
    """BN scale starts at 0 → the block is an identity mapping at init."""
    from cvpr2021_vspw_implement_tpu.models.nonlocal_blocks import NLBlockND
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 6, 6, 16),
                                                             np.float32))
    blk = NLBlockND(16, mode="dot")
    variables = blk.init({"params": KEY}, x, train=False)
    y = blk.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
