"""RAFT flow training/eval harness (reference: RAFT/train.py, RAFT/evaluate.py).

The reference vendors the full upstream RAFT repo with its own trainer
(AdamW + OneCycle LR + grad clipping + the gamma-weighted sequence loss,
RAFT/train.py:47-83,174-177) and per-benchmark validators (RAFT/evaluate.py).
This module provides the TPU-native equivalents:

  * ``sequence_loss`` — gamma^(N-i-1)-weighted L1 over all iteration
    predictions, invalid/extreme-flow pixels masked, EPE/1px/3px/5px metrics;
  * ``make_flow_train_step`` — one jitted step: forward with per-iteration
    predictions (``return_all``), loss, backward, global-norm clip, AdamW,
    linear one-cycle LR;
  * ``validate_epe`` — EPE over an (img1, img2, flow, valid) dataset.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

MAX_FLOW = 400.0


def sequence_loss(flow_preds: jnp.ndarray, flow_gt: jnp.ndarray,
                  valid: jnp.ndarray, gamma: float = 0.8,
                  max_flow: float = MAX_FLOW):
    """flow_preds: [N_iters, B, H, W, 2]; flow_gt: [B, H, W, 2];
    valid: [B, H, W] (≥0.5 = supervised).  Reference: RAFT/train.py:47-71."""
    n = flow_preds.shape[0]
    mag = jnp.sqrt(jnp.sum(jnp.square(flow_gt.astype(jnp.float32)), axis=-1))
    v = (valid >= 0.5) & (mag < max_flow)
    vf = v.astype(jnp.float32)[..., None]

    loss = 0.0
    for i in range(n):
        w = gamma ** (n - i - 1)
        loss = loss + w * jnp.mean(
            vf * jnp.abs(flow_preds[i].astype(jnp.float32) - flow_gt))

    epe_map = jnp.sqrt(jnp.sum(
        jnp.square(flow_preds[-1].astype(jnp.float32) - flow_gt), axis=-1))
    denom = jnp.maximum(jnp.sum(v), 1)
    epe_mean = jnp.sum(epe_map * v) / denom
    metrics = {
        "epe": epe_mean,
        "1px": jnp.sum((epe_map < 1) * v) / denom,
        "3px": jnp.sum((epe_map < 3) * v) / denom,
        "5px": jnp.sum((epe_map < 5) * v) / denom,
    }
    return loss, metrics


def one_cycle_linear(lr: float, num_steps: int, pct_start: float = 0.05):
    """torch OneCycleLR(anneal='linear') equivalent (RAFT/train.py:83-84)."""
    warmup = max(int(num_steps * pct_start), 1)
    return optax.join_schedules([
        optax.linear_schedule(lr / 25.0, lr, warmup),
        optax.linear_schedule(lr, lr / 25.0 * 1e-4, num_steps - warmup),
    ], [warmup])


def make_flow_optimizer(lr: float = 4e-4, num_steps: int = 100000,
                        wdecay: float = 1e-4, epsilon: float = 1e-8,
                        clip: float = 1.0):
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(one_cycle_linear(lr, num_steps + 100), eps=epsilon,
                    weight_decay=wdecay),
    )


def make_flow_train_step(model, tx, gamma: float = 0.8, batch_stats=None):
    """Jitted RAFT training step over (img1, img2, flow, valid) batches.

    BN runs on frozen running statistics (the reference freezes RAFT's BN
    outside the chairs stage, RAFT/train.py:158-160; use
    ``make_flow_train_step_bn`` for the chairs stage)."""
    batch_stats = batch_stats if batch_stats is not None else {}

    def step(params, opt_state, batch):
        def loss_fn(p):
            preds = model.apply({"params": p, "batch_stats": batch_stats},
                                batch["img1"], batch["img2"],
                                return_all=True)
            return sequence_loss(preds, batch["flow"], batch["valid"], gamma)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    return jax.jit(step)


def make_flow_train_step_bn(model, tx, gamma: float = 0.8):
    """Chairs-stage step: BN batch statistics UPDATE during training (the
    reference only freezes BN after the chairs stage, RAFT/train.py:147-148).
    Signature: (params, batch_stats, opt_state, batch) →
    (params, batch_stats, opt_state, metrics)."""

    def step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            preds, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["img1"], batch["img2"], return_all=True,
                train=True, mutable=["batch_stats"])
            loss, metrics = sequence_loss(preds, batch["flow"],
                                          batch["valid"], gamma)
            return loss, (metrics, mut["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return params, new_stats, opt_state, metrics

    return jax.jit(step)


def validate_chairs(model, variables, dataset, iters: int | None = None):
    """FlyingChairs validation-split EPE (reference: RAFT/evaluate.py:21-35):
    per-pixel EPEs of the upsampled final flow pooled over the whole split,
    then averaged.  Chairs images are 384x512 (already /8-aligned), so no
    padding is applied — exactly like the reference."""
    import numpy as np

    @jax.jit
    def infer(i1, i2):
        _, flow = model.apply(variables, i1, i2, test_mode=True)
        return flow

    epes = []
    for item in dataset:
        img1, img2, flow_gt = item[0], item[1], item[2]
        flow = np.asarray(infer(jnp.asarray(img1[None]),
                                jnp.asarray(img2[None])))[0]
        epe = np.sqrt(np.sum((flow - flow_gt) ** 2, axis=-1))
        epes.append(epe.reshape(-1))
    return {"chairs": float(np.mean(np.concatenate(epes)))}


def validate_epe(model, variables, dataset, iters: int | None = None) -> float:
    """Mean EPE over an iterable of (img1, img2, flow_gt[, valid]) numpy
    items (reference: RAFT/evaluate.py validate_* pattern)."""
    import numpy as np

    @jax.jit
    def infer(i1, i2):
        _, flow = model.apply(variables, i1, i2, test_mode=True)
        return flow

    epes = []
    for item in dataset:
        img1, img2, flow_gt = item[0], item[1], item[2]
        flow = np.asarray(infer(jnp.asarray(img1[None]),
                                jnp.asarray(img2[None])))[0]
        epe = np.sqrt(np.sum((flow - flow_gt) ** 2, axis=-1))
        if len(item) > 3:
            valid = item[3] >= 0.5
            epe = epe[valid]
        epes.append(epe.reshape(-1))
    return float(np.mean(np.concatenate(epes)))


def validate_sintel(model, variables, dataset, iters: int | None = None):
    """Sintel-train validation metrics (reference: RAFT/evaluate.py:96-126):
    pixel EPEs pooled over the whole split → mean EPE + 1px/3px/5px rates.
    ``dataset`` yields (img1, img2, flow_gt[, valid]) numpy items; images
    are padded to /8 with the 'sintel' padder like the reference."""
    import numpy as np

    from .raft import pad_to_multiple_of_8, unpad

    @jax.jit
    def infer(i1, i2):
        _, flow = model.apply(variables, i1, i2, test_mode=True)
        return flow

    epes = []
    for item in dataset:
        img1, img2, flow_gt = item[0], item[1], item[2]
        p1, pads = pad_to_multiple_of_8(jnp.asarray(img1[None]))
        p2, _ = pad_to_multiple_of_8(jnp.asarray(img2[None]))
        flow = np.asarray(unpad(infer(p1, p2), pads))[0]
        epe = np.sqrt(np.sum((flow - flow_gt) ** 2, axis=-1))
        epes.append(epe.reshape(-1))
    epe_all = np.concatenate(epes)
    return {"epe": float(np.mean(epe_all)),
            "1px": float(np.mean(epe_all < 1)),
            "3px": float(np.mean(epe_all < 3)),
            "5px": float(np.mean(epe_all < 5))}


def validate_kitti(model, variables, dataset, iters: int | None = None):
    """KITTI-2015-train validation (reference: RAFT/evaluate.py:131-166):
    per-image valid-pixel EPE means averaged, and F1-all = fraction of
    valid pixels with epe>3 AND epe/mag>0.05 (mag = |flow_gt|), pooled.
    Uses the 'kitti' padder (bottom-pad height)."""
    import numpy as np

    from .raft import pad_to_multiple_of_8, unpad

    @jax.jit
    def infer(i1, i2):
        _, flow = model.apply(variables, i1, i2, test_mode=True)
        return flow

    epe_list, out_list = [], []
    for img1, img2, flow_gt, valid_gt in dataset:
        p1, pads = pad_to_multiple_of_8(jnp.asarray(img1[None]), "kitti")
        p2, _ = pad_to_multiple_of_8(jnp.asarray(img2[None]), "kitti")
        flow = np.asarray(unpad(infer(p1, p2), pads))[0]
        epe = np.sqrt(np.sum((flow - flow_gt) ** 2, axis=-1)).reshape(-1)
        mag = np.sqrt(np.sum(flow_gt ** 2, axis=-1)).reshape(-1)
        val = valid_gt.reshape(-1) >= 0.5
        out = ((epe > 3.0) & ((epe / np.maximum(mag, 1e-12)) > 0.05))
        epe_list.append(float(epe[val].mean()))
        out_list.append(out[val])
    return {"epe": float(np.mean(epe_list)),
            "f1": float(100 * np.mean(np.concatenate(out_list)))}
