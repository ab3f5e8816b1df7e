"""Sharding-rules module: the param-path → PartitionSpec rules must cover
the model zoo's wide heads, and sharded execution must be numerically
equivalent to single-device execution (the reference's sync-BN test oracle
generalized: lib/nn/modules/tests/test_sync_batchnorm.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
from cvpr2021_vspw_implement_tpu.parallel import make_mesh, shard_tree
from cvpr2021_vspw_implement_tpu.parallel.sharding import tp_spec


def _tp_matches(params, n_model=2):
    out = []

    def walk(tree, pre=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, pre + k + "/")
            elif tp_spec(pre + k, v.shape, n_model) is not None:
                out.append(pre + k)

    walk(params)
    return out


def test_rules_cover_clip_psp_heads():
    from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP
    key = jax.random.PRNGKey(0)
    model = ClipPSP(encoder=ModelBuilder.build_encoder("resnet18dilated"),
                    num_class=8, fc_dim=512)
    v = jax.eval_shape(lambda: model.init(
        {"params": key, "dropout": key}, jnp.zeros((2, 1, 32, 32, 3)),
        train=True))
    hits = _tp_matches(v["params"])
    # 4 ppm convs + conv_last + deepsup
    assert len(hits) >= 6, hits


def test_rules_cover_clip_ocr_heads():
    from cvpr2021_vspw_implement_tpu.models.clip_ocr import ClipOCRNet
    key = jax.random.PRNGKey(0)
    model = ClipOCRNet(encoder=ModelBuilder.build_encoder("resnet18dilated"),
                       num_class=8)
    v = jax.eval_shape(lambda: model.init(
        {"params": key, "dropout": key}, jnp.zeros((2, 1, 32, 32, 3)),
        train=True))
    hits = _tp_matches(v["params"])
    # conv_3x3, dsn, f_pixel x2, f_object x2, f_down, f_up, fuse
    assert len(hits) >= 9, hits


def test_rules_cover_netwarp_heads():
    from cvpr2021_vspw_implement_tpu.models.netwarp import NetWarp
    key = jax.random.PRNGKey(0)
    model = NetWarp(encoder=ModelBuilder.build_encoder("resnet18dilated"),
                    num_class=8, fc_dim=512, raft_iters=1)
    v = jax.eval_shape(lambda: model.init(
        {"params": key, "dropout": key}, jnp.zeros((2, 1, 64, 64, 3)),
        train=True))
    hits = _tp_matches(v["params"])
    # 4 decoder ppm convs + decoder conv_last_ + cbr_deepsup + blend head
    assert len(hits) >= 7, hits
    assert not any("raft" in h or "flowcnn" in h for h in hits)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_sharded_eval_equivalence():
    """dp x tp sharded inference == single-device inference, bit-for-bit
    modulo float reassociation (allclose)."""
    from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP
    from cvpr2021_vspw_implement_tpu.models.segmentation import (
        inference_probs)

    key = jax.random.PRNGKey(0)
    model = ClipPSP(encoder=ModelBuilder.build_encoder("resnet18dilated"),
                    num_class=8, fc_dim=512)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.standard_normal((3, 4, 32, 32, 3)).astype(np.float32))
    variables = model.init({"params": key, "dropout": key}, imgs, train=False)

    ref = inference_probs(model.apply(variables, imgs, train=False), (32, 32))

    mesh = make_mesh(4, 2)
    with mesh:
        svars = shard_tree(variables, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P
        simgs = jax.device_put(imgs, NamedSharding(mesh, P(None, "data")))

        @jax.jit
        def infer(v, x):
            return inference_probs(model.apply(v, x, train=False), (32, 32))

        got = infer(svars, simgs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
