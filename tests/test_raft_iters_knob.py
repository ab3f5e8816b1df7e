"""TPU.raft_iters recipe knob: fewer frozen-flow refinement iterations.

The reference hard-codes ``iters=20`` for the frozen RAFT inside NetWarp
and ETC (/root/reference/models/net_warp.py's raft call).  ``TPU.raft_iters``
exposes it as a speed/accuracy recipe knob; the parameter tree must not
depend on it so any checkpoint loads at any iteration count.
"""

import argparse

import jax
import jax.numpy as jnp
import pytest

from cvpr2021_vspw_implement_tpu.config import cfg as default_cfg


def _args(method):
    return argparse.Namespace(
        num_class=5, method=method, clip_num=2, dilation_num=0,
        deepsup_scale=0.4, st_weight=0.1, psp_weight=False,
        clipocr_all=False, fix=False, cropsize=40, lesslabel=False)


def _cfg(raft_iters):
    cfg = default_cfg.clone()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.fc_dim = 512
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.remat = False
    cfg.TPU.raft_iters = raft_iters
    return cfg


@pytest.mark.smoke
@pytest.mark.parametrize("method", ["netwarp", "ETC"])
def test_raft_iters_plumbs_and_keeps_param_tree(method):
    from cvpr2021_vspw_implement_tpu.methods import build_method

    m20, _ = build_method(method, _cfg(20), _args(method))
    m3, loss = build_method(method, _cfg(3), _args(method))
    assert m20.raft_iters == 20 and m3.raft_iters == 3

    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 1, 40, 48, 3), jnp.float32)
    v3 = m3.init({"params": key, "dropout": key}, sample, train=True)
    v20 = m20.init({"params": key, "dropout": key}, sample, train=True)
    # identical trees: a checkpoint trained at 20 iters loads at 3
    assert jax.tree_util.tree_structure(v3["params"]) == \
        jax.tree_util.tree_structure(v20["params"])
    for a, b in zip(jax.tree_util.tree_leaves(v3["params"]),
                    jax.tree_util.tree_leaves(v20["params"])):
        assert a.shape == b.shape

    out = m3.apply(v3, sample, train=True,
                   rngs={"dropout": jax.random.PRNGKey(1)},
                   mutable=["batch_stats"])[0]
    leaves = jax.tree_util.tree_leaves(out)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
