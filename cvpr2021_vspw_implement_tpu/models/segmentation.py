"""Per-frame segmentation task module: model wrapper, loss, inference.

Replicates the reference dual-mode contract (reference: models/models.py:74-111):
  * training: ``loss, acc`` where loss = NLL(log_softmax(upsampled logits),
    label, ignore=255) + deep_sup_scale * NLL(deepsup);
  * inference: softmax probabilities bilinearly upsampled to ``seg_size``.

Functionally decomposed for JAX: the flax module produces logits; pure
functions below assemble the loss / the inference probabilities so both can
be jitted and differentiated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_bilinear
from ..utils.metrics import pixel_acc


class SegmentationModule(nn.Module):
    """Encoder + decoder producing (logits, deepsup_logits?) tuples."""

    encoder: nn.Module
    decoder: nn.Module

    def __call__(self, img, train: bool = False, valid_hw=None):
        """img: [N, H, W, 3] normalized; returns decoder output tuple.

        ``valid_hw``: runtime (rows, cols) of the TRUE image inside a
        width-bucketed zero-padded ``img`` (ops/masked.py) — the trunk
        runs under the conv-input mask interceptor and the decoder gets
        the feature-level valid size; predictions on the valid region are
        bit-identical to the unpadded run, at one compile per bucket."""
        if valid_hw is None:
            conv_out = self.encoder(img, train=train)
            return self.decoder(conv_out, train=train)
        from ..ops.masked import (feature_valid, mask_valid, masked_trunk)
        pad_hw = img.shape[1:3]
        from .hrnet import HRNetV2
        enc_kwargs = {}
        if isinstance(self.encoder, HRNetV2):
            # hrnet's cross-resolution fusion upsamples need runtime sizes
            enc_kwargs = dict(valid_hw=valid_hw, pad_hw=pad_hw)
        with masked_trunk(valid_hw, pad_hw):
            conv_out = self.encoder(img, train=train, **enc_kwargs)
        # trunk outputs are NOT pre-masked under the spatial-conv-input
        # interceptor (ops/masked.py) — re-zero every level the decoders
        # feed to their own (un-intercepted) spatial convs
        conv_out = [mask_valid(x, feature_valid(x.shape[1], x.shape[2],
                                                valid_hw, pad_hw))
                    for x in conv_out]
        from .decoders import UPerNet
        from .deeplab import DeepLab
        if isinstance(self.decoder, (UPerNet, DeepLab)):
            # these decoders span multiple strides (FPN levels / the
            # ASPP-OS8 + low-level-OS4 merge): each derives per-level
            # valid sizes from the input-level pair itself
            return self.decoder(conv_out, train=train, valid_hw=valid_hw,
                                pad_hw=pad_hw)
        c5 = conv_out[-1]
        fv = feature_valid(c5.shape[1], c5.shape[2], valid_hw, pad_hw)
        return self.decoder(conv_out, train=train, valid_hw=fv)


def nll_from_logprobs(logp: jnp.ndarray, label: jnp.ndarray,
                      ignore_index: int = 255) -> jnp.ndarray:
    """torch NLLLoss(ignore_index) on (possibly resized) log-probabilities.

    Mean over non-ignored pixels (torch default reduction).
    """
    valid = label != ignore_index
    lab = jnp.where(valid, label, 0).astype(jnp.int32)
    # gather-free label pick: an iota-compare one-hot fused into the channel
    # reduce.  TPU scalar gathers are ~45 ns each (measured on the RAFT corr
    # lookup, ops/pallas/corr.py); at 479^2 x (T+1)B pixels the old
    # take_along_axis cost ~20% of the whole clip_psp train step
    # (164.2 -> 131.0 ms measured on v5e).  Algebraically identical.
    logp = logp.astype(jnp.float32)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logp.shape, logp.ndim - 1)
              == lab[..., None])
    picked = jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    loss_sum = -jnp.sum(picked * valid)
    return loss_sum / jnp.maximum(jnp.sum(valid), 1)


def nll_loss(logits: jnp.ndarray, label: jnp.ndarray,
             ignore_index: int = 255) -> jnp.ndarray:
    """Cross entropy on logits == NLLLoss(log_softmax) of the reference."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return nll_from_logprobs(logp, label, ignore_index)


def upsampled_logprob_loss(logits: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """The reference's exact training-loss order: log_softmax at FEATURE
    resolution, bilinear upsample of the log-probabilities to the label
    size, then NLL (reference: decoder applies log_softmax in-forward,
    models/models.py:954-957, and the task wrapper interpolates that,
    models/models.py:96-104)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp = resize_bilinear(logp, label.shape[1:3])
    return nll_from_logprobs(logp, label)


def upsampled_logprob_loss_projected(logits: jnp.ndarray,
                                     label: jnp.ndarray) -> jnp.ndarray:
    """``upsampled_logprob_loss`` computed by the transpose trick:

        -<onehot_valid, Rh·logp·Rw>/N  ==  -<Rhᵀ·onehot_valid·Rwᵀ, logp>/N

    (linearity of the separable resize).  Numerically equal within f32
    reassociation, but the [N, H, W, K] full-resolution log-prob volume —
    455 MB per 479² batch element at K=124, ~4x that for the deep-sup
    branch — is NEVER materialized, and its backward collapses to the
    projected-mask constant.  Measured on v5e this is pure HBM-traffic
    savings; use wherever the upsampled log-probs are not ALSO needed for
    the accuracy metric (deep-supervision branches)."""
    b, fh, fw, k = logits.shape
    h, w = label.shape[1:3]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    from ..ops.interpolate import _linear_weights
    rh = jnp.asarray(_linear_weights(fh, h, False))      # [H, fh]
    rw = jnp.asarray(_linear_weights(fw, w, False))      # [W, fw]
    valid = label != 255
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (b, h, w, k), 3)
              == jnp.where(valid, label, 0).astype(jnp.int32)[..., None])
    ohf = jnp.where(onehot & valid[..., None], 1.0, 0.0)
    m = jnp.einsum("hf,bhwk->bfwk", rh, ohf)
    m = jnp.einsum("wg,bfwk->bfgk", rw, m)               # [b, fh, fw, k]
    nvalid = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jax.lax.stop_gradient(m) * logp) / nvalid


def segmentation_loss(outputs, label: jnp.ndarray,
                      deep_sup_scale: float | None = 0.4):
    """Training loss + pixel acc (reference: models/models.py:82-108).

    outputs: tuple of logits — (main,) or (main, deepsup), at feature
    resolution.  Replicates the reference order exactly: log-probs are
    computed at feature resolution and bilinearly upsampled before NLL.
    label: [N, H, W] int32 with 255 = ignore.
    """
    h, w = label.shape[1:3]
    # projected (transpose-trick) NLL — equal to resize-then-pick without
    # materializing the full-res log-prob volumes for the loss; acc
    # argmaxes upsampled raw logits under stop_gradient (argmax is
    # invariant to the per-pixel log-softmax shift, so it equals the
    # reference's argmax of the resized log-probs)
    loss = upsampled_logprob_loss_projected(outputs[0], label)
    if deep_sup_scale is not None and len(outputs) > 1:
        loss = loss + deep_sup_scale * upsampled_logprob_loss_projected(
            outputs[1], label)
    up = resize_bilinear(
        jax.lax.stop_gradient(outputs[0]).astype(jnp.float32), (h, w))
    acc_label = jnp.where(label == 255, -1, label)
    acc = pixel_acc(up, acc_label)
    return loss, acc


def inference_probs(outputs, seg_size: tuple[int, int],
                    precision=None) -> jnp.ndarray:
    """Softmax probabilities at seg_size (reference: models/models.py:109-111)."""
    logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
    x = resize_bilinear(logits.astype(jnp.float32), seg_size,
                        precision=precision)
    return jax.nn.softmax(x, axis=-1)


def inference_pred(outputs, seg_size: tuple[int, int],
                   align_corners: bool = False,
                   precision=None) -> jnp.ndarray:
    """Argmax prediction at seg_size.

    Identical to ``argmax(inference_probs(...))`` (softmax is monotone; the
    reference argmaxes the softmax output, test.py:66-70) but returns a
    [N, H, W] uint8 map — ~500x less HBM traffic and host transfer than the
    full probability volume.  Use for plain eval; use ``inference_probs``
    when probabilities must be averaged across windows (nonlocal3d
    ``test_all``, reference: test_clip2.py:90-195).

    ``precision``: forwarded to the resize einsums.  TPU default precision
    rounds the f32 logits to bf16 in the MXU, which can flip the argmax at
    near-tie pixels (0.69% on random N(0,1) logits, 0 at trained-logit
    margins; tools/pred_micro.py); ``jax.lax.Precision.HIGHEST`` makes the
    interpolation exact-f32 for +0.35 ms/frame.
    """
    logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
    x = resize_bilinear(logits.astype(jnp.float32), seg_size,
                        align_corners=align_corners, precision=precision)
    return jnp.argmax(x, axis=-1).astype(jnp.uint8)


def inference_pred_rt(outputs, seg_pad: tuple[int, int], feat_valid,
                      seg_valid, align_corners: bool = False) -> jnp.ndarray:
    """``inference_pred`` for width-bucketed masked eval: resize the VALID
    region of the logits to the runtime true output size on a static
    padded grid (ops/masked.py), then argmax.  Rows/cols beyond
    ``seg_valid`` are garbage — the caller crops."""
    from ..ops.masked import resize_bilinear_rt
    logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
    x = resize_bilinear_rt(logits.astype(jnp.float32), seg_pad, feat_valid,
                           seg_valid, align_corners=align_corners)
    return jnp.argmax(x, axis=-1).astype(jnp.uint8)


def inference_probs_rt(outputs, seg_pad: tuple[int, int], feat_valid,
                       seg_valid) -> jnp.ndarray:
    """``inference_probs`` for width-bucketed masked eval (the nonlocal3d
    ``test_all`` score averaging needs probabilities, not argmax).
    Rows/cols beyond ``seg_valid`` are garbage — the caller crops."""
    from ..ops.masked import resize_bilinear_rt
    logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
    x = resize_bilinear_rt(logits.astype(jnp.float32), seg_pad, feat_valid,
                           seg_valid)
    return jax.nn.softmax(x, axis=-1)
