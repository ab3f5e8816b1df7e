"""Fused Pallas SepConvGRU pass == the XLA reference formulation.

Interpret mode on CPU; the same kernel compiles on TPU (exercised by
bench.py's netwarp step).  Reference math: RAFT_core/update.py:33-60."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2021_vspw_implement_tpu.ops.pallas.gru import (
    sep_conv_gru_pass, sep_conv_gru_pass_xla)


def _make_inputs(key, b, h, w, hd, cx, kh, kw, dtype):
    ks = jax.random.split(key, 6)
    cin = hd + cx
    h0 = jnp.tanh(jax.random.normal(ks[0], (b, h, w, hd))).astype(dtype)
    x = jax.random.normal(ks[1], (b, h, w, cx)).astype(dtype)
    kzr = (0.1 * jax.random.normal(ks[2], (kh, kw, cin, 2 * hd))
           ).astype(dtype)
    bzr = (0.1 * jax.random.normal(ks[3], (2 * hd,))).astype(dtype)
    kq = (0.1 * jax.random.normal(ks[4], (kh, kw, cin, hd))).astype(dtype)
    bq = (0.1 * jax.random.normal(ks[5], (hd,))).astype(dtype)
    return h0, x, kzr, bzr, kq, bq


@pytest.mark.parametrize("axis,kh,kw", [(0, 1, 5), (1, 5, 1)])
@pytest.mark.parametrize("shape", [(2, 16, 24), (1, 15, 21)])
def test_gru_pass_matches_xla(axis, kh, kw, shape):
    b, h, w = shape
    hd, cx = 32, 64
    h0, x, kzr, bzr, kq, bq = _make_inputs(
        jax.random.PRNGKey(axis * 7 + h), b, h, w, hd, cx, kh, kw,
        jnp.float32)
    want = sep_conv_gru_pass_xla(h0, x, kzr, bzr, kq, bq, axis=axis)
    got = sep_conv_gru_pass(h0, x, kzr, bzr, kq, bq, axis=axis,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


def test_gru_pass_gradients_match_xla():
    b, h, w, hd, cx = 1, 8, 16, 16, 32
    h0, x, kzr, bzr, kq, bq = _make_inputs(
        jax.random.PRNGKey(3), b, h, w, hd, cx, 1, 5, jnp.float32)

    def loss_fused(args):
        out = sep_conv_gru_pass(*args, axis=0, interpret=True)
        return jnp.sum(out * out)

    def loss_xla(args):
        out = sep_conv_gru_pass_xla(*args, axis=0)
        return jnp.sum(out * out)

    args = (h0, x, kzr, bzr, kq, bq)
    g_fused = jax.grad(loss_fused)(args)
    g_xla = jax.grad(loss_xla)(args)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=1e-4, rtol=1e-4)


def test_gru_module_pallas_toggle_consistency(monkeypatch):
    """SepConvGRU's XLA branch (fused z|r conv) == torch-shaped math; the
    pallas branch is covered by the kernel tests above."""
    from cvpr2021_vspw_implement_tpu.models.raft.update import SepConvGRU

    key = jax.random.PRNGKey(0)
    h0 = jnp.tanh(jax.random.normal(key, (2, 12, 20, 32)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 20, 48))
    gru = SepConvGRU(hidden_dim=32)
    variables = gru.init(key, h0, x)
    out = gru.apply(variables, h0, x)

    # hand-rolled two-pass math from the same params
    p = variables["params"]
    cur = h0
    for axis, (kh, kw) in enumerate([(1, 5), (5, 1)]):
        def conv(inp, name):
            k, bias = p[name]["kernel"], p[name]["bias"]
            return jax.lax.conv_general_dilated(
                inp, k, (1, 1),
                ((kh // 2, kh // 2), (kw // 2, kw // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        hx = jnp.concatenate([cur, x], axis=-1)
        z = jax.nn.sigmoid(conv(hx, f"convz{axis + 1}"))
        r = jax.nn.sigmoid(conv(hx, f"convr{axis + 1}"))
        q = jnp.tanh(conv(jnp.concatenate([r * cur, x], -1),
                          f"convq{axis + 1}"))
        cur = (1 - z) * cur + z * q
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur),
                               atol=1e-5, rtol=1e-5)
