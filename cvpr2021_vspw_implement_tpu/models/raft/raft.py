"""RAFT optical flow in JAX (reference: RAFT_core/raft.py:26-127).

A frozen flow estimator used by NetWarp/ETC task modules and the TC metric:
feature+context encoders, a 4-level all-pairs correlation pyramid, and an
iterative SepConvGRU refinement with convex 8x upsampling.

TPU-first structure: the refinement loop is a ``lax.scan`` with static
iteration count; the correlation volume is one MXU matmul; lookups are
static-shape gathers (see corr.py); the whole thing jits into a single
program.  All parameters live under this module and are excluded from
optimization by the task modules (reference freezes them at load,
raft.py:43-45).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.interpolate import resize_bilinear
from .corr import (build_corr_pyramid, lookup_corr_pyramid,
                   lookup_corr_pyramid_onehot)
from .extractor import BasicEncoder
from .update import BasicUpdateBlock


def coords_grid(batch: int, ht: int, wd: int) -> jnp.ndarray:
    """[B, H, W, 2] (x, y) pixel coordinate grid (utils.py:76-79)."""
    xs = jax.lax.broadcasted_iota(jnp.float32, (batch, ht, wd), 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, (batch, ht, wd), 1)
    return jnp.stack([xs, ys], axis=-1)


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x bilinear (align_corners=True) upsample of [B,H,W,2], scaled by 8."""
    b, h, w, _ = flow.shape
    return 8.0 * resize_bilinear(flow, (8 * h, 8 * w), align_corners=True)


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x upsampling (reference: raft.py:61-72).

    flow: [B, H, W, 2]; mask: [B, H, W, 576] laid out as (9, 8, 8) —
    9 taps outer, then the 8x8 sub-pixel grid (torch view(N,1,9,8,8,H,W)).
    """
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 8, 8).astype(jnp.float32)
    m = jax.nn.softmax(m, axis=3)

    f = 8.0 * flow.astype(jnp.float32)
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood, row-major (dy, dx) — torch F.unfold order
    taps = [fp[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w, :]
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    nb = jnp.stack(taps, axis=3)                        # [B, H, W, 9, 2]
    up = jnp.einsum("bhwkyx,bhwkc->bhwyxc", m, nb)      # [B, H, W, 8, 8, 2]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


class RAFT(nn.Module):
    """imgs in [0, 255], NHWC.  ``test_mode`` returns (lowres, full) flow."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, image1, image2, flow_init=None, test_mode: bool = False,
                 return_all: bool = False, train: bool = False,
                 valid_hw=None):
        """``valid_hw``: runtime (rows, cols) of the TRUE (/8-aligned)
        image extent inside width-bucketed zero-padded inputs — the whole
        network runs under the conv-boundary mask interceptor with masked
        instance-norm statistics, masked GRU carries and masked pyramid
        levels (ops/masked.py), making the valid-region flow equal to the
        unpadded run's.  valid_hw must be a multiple of 8 (the caller
        emulates the reference's /8 InputPadder inside the bucket grid)."""
        if valid_hw is not None:
            from ...ops.masked import mask_context, mask_interceptor
            pad_hw = (image1.shape[1], image1.shape[2])
            with nn.intercept_methods(
                    mask_interceptor(valid_hw, pad_hw)), \
                    mask_context(valid_hw, pad_hw):
                return self._forward(image1, image2, flow_init, test_mode,
                                     return_all, train, valid_hw)
        return self._forward(image1, image2, flow_init, test_mode,
                             return_all, train, None)

    def _forward(self, image1, image2, flow_init, test_mode: bool,
                 return_all: bool, train: bool, valid_hw):
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0

        fnet = BasicEncoder(256, "instance", dtype=self.dtype, name="fnet")
        # shared weights over both frames, exactly like fnet([im1, im2])
        pair = jnp.concatenate([image1, image2], axis=0)
        # keep the encoder's compute dtype into the all-pairs matmul (bf16
        # MXU contraction with f32 accumulation) and store the pyramid in
        # the same dtype — the level-0 plane re-read by all `iters` lookups
        # is the refinement loop's dominant HBM stream (see corr.py)
        fmaps = fnet(pair, train)
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels,
                                     store_dtype=self.dtype)
        if valid_hw is not None:
            # each level's valid extent is floor(prev/2) (the unpadded
            # pooling discards the odd tail); boundary-straddling windows
            # of the padded pooling must read as zero — exactly what the
            # unpadded run's out-of-range lookup taps see
            from ...ops.masked import feature_valid, mask_valid_hw2
            lv = feature_valid(fmap1.shape[1], fmap1.shape[2], valid_hw,
                               (image1.shape[1], image1.shape[2]))
            masked_pyr = [mask_valid_hw2(pyramid[0], lv)]
            for lev in pyramid[1:]:
                lv = (lv[0] // 2, lv[1] // 2)
                masked_pyr.append(mask_valid_hw2(lev, lv))
            pyramid = masked_pyr

        cnet = BasicEncoder(self.hidden_dim + self.context_dim, "batch",
                            dtype=self.dtype, name="cnet")(image1, train)
        net = jnp.tanh(cnet[..., :self.hidden_dim].astype(jnp.float32))
        inp = nn.relu(cnet[..., self.hidden_dim:].astype(jnp.float32))

        b, h8, w8 = fmap1.shape[0], fmap1.shape[1], fmap1.shape[2]
        coords0 = coords_grid(b, h8, w8)
        coords1 = coords0 if flow_init is None else coords0 + flow_init

        update = BasicUpdateBlock(self.hidden_dim, dtype=self.dtype,
                                  name="update_block")

        # gather-free lookup on TPU: the one-hot-MATMUL formulation
        # (corr.py::lookup_corr_pyramid_onehot) runs the separable bilinear
        # window sample as two batched MXU contractions — measured
        # 2.3 ms/lookup on v5e at RAFT-480p vs 5.6 ms for the Pallas VPU
        # mask-reduce kernel (ops/pallas/corr.py, selectable via
        # VSPW_LOOKUP=pallas) and 112 ms for take_along_axis; the XLA
        # gather path stays the CPU/init default (host einsums lose to
        # gathers at these shapes, and flax init may execute on CPU)
        import os as _os
        choice = _os.environ.get("VSPW_LOOKUP", "onehot")
        if self.is_initializing() or jax.default_backend() in ("cpu",):
            lookup = lookup_corr_pyramid
        elif (choice == "pallas"
                or _os.environ.get("VSPW_TPU_PALLAS", "1") != "1"):
            # VSPW_TPU_PALLAS=0 historically selected the XLA formulations
            if choice == "pallas":
                from ...ops.pallas.corr import lookup_corr_pyramid_fused
                lookup = lookup_corr_pyramid_fused
            else:
                lookup = lookup_corr_pyramid
        elif choice == "gather":
            lookup = lookup_corr_pyramid
        else:
            lookup = lookup_corr_pyramid_onehot

        def one_iter(net, coords1, with_mask):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, up_mask, delta = update(net, inp, corr.astype(net.dtype),
                                         flow, with_mask=with_mask)
            coords1 = coords1 + delta.astype(jnp.float32)
            return net, coords1, up_mask

        if self.is_initializing():
            # create the update block's params with one unrolled iteration —
            # flax can't create params inside lax.scan
            net, coords1, up_mask = one_iter(net, coords1, True)
            all_flows = None
        elif return_all:
            # per-iteration upsampled predictions (training sequence loss,
            # reference: raft.py:113-123) need the mask every iteration
            def step(carry, _):
                net, coords1 = carry
                net, coords1, up_mask = one_iter(net, coords1, True)
                out = upsample_flow_convex(coords1 - coords0,
                                           up_mask.astype(jnp.float32))
                return (net, coords1), out

            (net, coords1), all_flows = jax.lax.scan(
                step, (net, coords1), None, length=self.iters)
            up_mask = None
        else:
            # only the FINAL iteration's mask is consumed — hoist the mask
            # head out of the scan entirely (the reference recomputes and
            # discards it every iteration, RAFT_core/update.py:136)
            def step(carry, _):
                net, coords1 = carry
                net, coords1, _ = one_iter(net, coords1, False)
                return (net, coords1), None

            (net, coords1), _ = jax.lax.scan(
                step, (net, coords1), None, length=self.iters)
            up_mask = update.mask(net)
            all_flows = None

        flow_low = coords1 - coords0
        if valid_hw is not None:
            # padded-position flow is garbage under the spatial-conv-input
            # interceptor; the convex upsampler's 3x3 neighbor taps at the
            # valid boundary must read zeros (== the unpadded run's
            # zero-padded unfold)
            from ...ops.masked import feature_valid, mask_valid
            lv = feature_valid(flow_low.shape[1], flow_low.shape[2],
                               valid_hw, (image1.shape[1], image1.shape[2]))
            flow_low = mask_valid(flow_low, lv)
        if up_mask is not None:
            flow_up = upsample_flow_convex(flow_low,
                                           up_mask.astype(jnp.float32))
        if return_all and all_flows is not None:
            return all_flows                     # [iters, B, 8H, 8W, 2]
        if test_mode:
            return flow_low, flow_up
        return flow_up


def pad_to_multiple_of_8(x: jnp.ndarray, mode: str = "sintel"):
    """InputPadder (reference: RAFT_core/utils/utils.py:7-25).

    'sintel': symmetric pads; 'kitti': height padded at the bottom only.
    x: [B, H, W, C] → (padded, (top, bottom, left, right)).
    """
    h, w = x.shape[1:3]
    pad_h = (((h // 8) + 1) * 8 - h) % 8
    pad_w = (((w // 8) + 1) * 8 - w) % 8
    if mode == "kitti":
        pads = (0, pad_h, pad_w // 2, pad_w - pad_w // 2)
    else:
        pads = (pad_h // 2, pad_h - pad_h // 2,
                pad_w // 2, pad_w - pad_w // 2)
    padded = jnp.pad(x, ((0, 0), (pads[0], pads[1]), (pads[2], pads[3]),
                         (0, 0)))
    return padded, pads


def unpad(x: jnp.ndarray, pads) -> jnp.ndarray:
    t, b, l, r = pads
    h, w = x.shape[1:3]
    return x[:, t:h - b if b else h, l:w - r if r else w, :]
