"""Fused RAFT update-iteration kernels == the XLA reference formulation.

Interpret mode on CPU; compiled path exercised by bench.py's netwarp step.
Reference math: RAFT_core/update.py:8-97."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.ops.pallas.raft_update import (
    gru_flowhead_fused, gru_flowhead_xla, motion_encoder_fused,
    motion_encoder_xla)


def _conv_params(key, kh, kw, cin, cout, scale=0.1):
    k1, k2 = jax.random.split(key)
    return {"kernel": scale * jax.random.normal(k1, (kh, kw, cin, cout)),
            "bias": scale * jax.random.normal(k2, (cout,))}


def _motion_params(key):
    ks = jax.random.split(key, 5)
    return {"convc1": _conv_params(ks[0], 1, 1, 324, 256),
            "convc2": _conv_params(ks[1], 3, 3, 256, 192),
            "convf1": _conv_params(ks[2], 7, 7, 2, 128),
            "convf2": _conv_params(ks[3], 3, 3, 128, 64),
            "conv": _conv_params(ks[4], 3, 3, 256, 126)}


def _gru_params(key, hd=32, cx=64):
    ks = jax.random.split(key, 8)
    cin = hd + cx
    return {"convz1": _conv_params(ks[0], 1, 5, cin, hd),
            "convr1": _conv_params(ks[1], 1, 5, cin, hd),
            "convq1": _conv_params(ks[2], 1, 5, cin, hd),
            "convz2": _conv_params(ks[3], 5, 1, cin, hd),
            "convr2": _conv_params(ks[4], 5, 1, cin, hd),
            "convq2": _conv_params(ks[5], 5, 1, cin, hd),
            "fh_conv1": _conv_params(ks[6], 3, 3, hd, 256),
            "fh_conv2": _conv_params(ks[7], 3, 3, 256, 2)}


@pytest.mark.parametrize("hw", [(12, 16), (9, 13)])
def test_motion_encoder_fused_matches_xla(hw):
    h, w = hw
    key = jax.random.PRNGKey(0)
    p = _motion_params(key)
    corr = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 324))
    flow = 3.0 * jax.random.normal(jax.random.PRNGKey(2), (2, h, w, 2))
    want = motion_encoder_xla(corr, flow, p)
    got = motion_encoder_fused(corr, flow, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=8e-5, rtol=8e-5)


@pytest.mark.parametrize("hw", [(12, 16), (9, 13)])
def test_gru_flowhead_fused_matches_xla(hw):
    h, w = hw
    p = _gru_params(jax.random.PRNGKey(3))
    net = jnp.tanh(jax.random.normal(jax.random.PRNGKey(4), (2, h, w, 32)))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, h, w, 64))
    want_net, want_d = gru_flowhead_xla(net, x, p)
    got_net, got_d = gru_flowhead_fused(net, x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got_net), np.asarray(want_net),
                               atol=8e-5, rtol=8e-5)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               atol=8e-5, rtol=8e-5)


def test_fused_update_gradients_match_xla():
    """Custom VJPs replay the XLA formulation exactly."""
    p = _gru_params(jax.random.PRNGKey(6))
    net = jnp.tanh(jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 32)))
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 8, 64))

    def loss_fused(args):
        n, d = gru_flowhead_fused(args[0], args[1], args[2], True)
        return jnp.sum(n * n) + jnp.sum(d * d)

    def loss_xla(args):
        n, d = gru_flowhead_xla(*args)
        return jnp.sum(n * n) + jnp.sum(d * d)

    g_f = jax.grad(loss_fused)((net, x, p))
    g_x = jax.grad(loss_xla)((net, x, p))
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
