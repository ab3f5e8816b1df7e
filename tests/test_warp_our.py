"""Local cost-volume ops parity vs torch-unfold oracle + ClipWarpNet tests."""

import argparse

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.ops.local_pairwise import (
    local_pairwise_dist, local_weighted_aggregate, local_window_gather)

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(0)


def torch_local_pairwise(x_nhwc, y_nhwc, r):
    """torch replica of the reference local_pairwise_map (warp_our.py:20-50)."""
    x = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)).contiguous()
    y = torch.from_numpy(y_nhwc.transpose(0, 3, 1, 2)).contiguous()
    n, c, h, w = x.shape
    x2 = x.view(n, c, -1).permute(0, 2, 1)
    x2 = torch.matmul(x2.unsqueeze(2), x2.unsqueeze(-1))
    y2 = y.view(n, c, -1).permute(0, 2, 1)
    y2 = torch.matmul(y2.unsqueeze(2), y2.unsqueeze(-1)).view(n, 1, h, w)
    padded_y = F.pad(y, (r, r, r, r))
    padded_y2 = F.pad(y2, (r, r, r, r), mode="constant", value=1e20)
    kernel = 2 * r + 1
    offset_y = F.unfold(padded_y, kernel_size=(h, w)).view(
        n, c, h * w, -1).permute(0, 2, 1, 3)
    offset_y2 = F.unfold(padded_y2, kernel_size=(h, w)).view(n, h, w, -1)
    xq = x.contiguous().view(n, c, h * w, -1).permute(0, 2, 3, 1)
    x2q = x2.view(n, h, w, 1)
    dists = x2q + offset_y2 - 2.0 * torch.matmul(xq, offset_y).view(
        n, h, w, kernel * kernel)
    return dists.view(n, h, w, kernel, kernel).numpy()


@pytest.mark.parametrize("r", [1, 3])
def test_local_pairwise_dist_matches_reference(r):
    x = RNG.standard_normal((2, 7, 9, 6), np.float32)
    y = RNG.standard_normal((2, 7, 9, 6), np.float32)
    ours = np.asarray(local_pairwise_dist(jnp.asarray(x), jnp.asarray(y), r))
    ref = torch_local_pairwise(x, y, r)
    # in-bounds positions match tightly; OOB are both ~1e20
    inb = ref < 1e19
    np.testing.assert_allclose(ours[inb], ref[inb], rtol=1e-4, atol=1e-4)
    assert np.all(ours[~inb] > 1e19)


def test_weighted_aggregate_matches_window_gather():
    y = jnp.asarray(RNG.standard_normal((1, 6, 7, 4), np.float32))
    wts = jnp.asarray(RNG.random((1, 6, 7, 5, 5), np.float32))
    fast = local_weighted_aggregate(y, wts, 2)
    windows = local_window_gather(y, 2)     # [B,H,W,k,k,C]
    ref = jnp.einsum("bhwklc,bhwkl->bhwc", windows, wts)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def _args(**kw):
    ns = argparse.Namespace(fix=False, max_distances=[2], linear_combine=False,
                            distsoftmax=False, distnearest=False, temp=3.0)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


@pytest.mark.parametrize("mode", ["sigmoid", "softmax", "nearest", "linear"])
def test_clip_warp_net_modes(mode):
    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.warp_our import (ClipWarpNet,
                                                             clip_warp_loss)
    args = _args(distsoftmax=mode == "softmax", distnearest=mode == "nearest",
                 linear_combine=mode == "linear")
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipWarpNet(encoder=enc, num_class=5, fc_dim=512, args=args)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((3, 1, 32, 32, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (3, 1, 32, 32)), jnp.int32)
    variables = model.init({"params": KEY, "dropout": KEY}, imgs, train=True)
    outs, _ = model.apply(variables, imgs, train=True,
                          mutable=["batch_stats"], rngs={"dropout": KEY})
    assert outs["pred"].shape == (1, 4, 4, 5)
    assert outs["allsup"].shape == (3, 4, 4, 5)
    loss, acc = clip_warp_loss(outs, {"labels": labels}, allsup=True)
    assert np.isfinite(float(loss))
    eval_out = model.apply(variables, imgs, train=False)
    assert eval_out[0].shape == (1, 4, 4, 5)
