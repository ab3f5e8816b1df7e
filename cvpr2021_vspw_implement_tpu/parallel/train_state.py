"""Train state pytree + jitted train/eval step factories.

Replaces the reference's driver inner loop (reference: train.py:23-126,
train_clip2.py:26-126): one ``jit``-compiled function per step containing
forward, loss, backward, optimizer update and BN running-stat update.  Under
GSPMD with the batch sharded on the mesh 'data' axis, gradient and BN-stat
all-reduces are inserted by XLA — there is no hand-written communication.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.segmentation import inference_probs, segmentation_loss


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params))


def make_train_step(model, tx, deep_sup_scale: float | None = 0.4,
                    loss_fn: Callable | None = None,
                    donate: bool = True,
                    static_kwarg: str | None = None):
    """Build the jitted per-frame train step.

    ``loss_fn(outs, batch) -> (loss, acc)`` may override the default
    segmentation loss (used by temporal task modules with richer batches).
    ``static_kwarg`` names an extra static model argument passed as the
    step's 4th positional arg (tdnet's rotating ``pos_id`` — one compiled
    variant per value).
    """

    if loss_fn is None:
        def loss_fn(outs, batch):
            return segmentation_loss(outs, batch["label"], deep_sup_scale)

    def train_step(state: TrainState, batch, dropout_rng, static_val=None):
        rng = jax.random.fold_in(dropout_rng, state.step)
        kwargs = {static_kwarg: static_val} if static_kwarg else {}

        def compute_loss(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["img"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng}, **kwargs)
            loss, acc = loss_fn(outs, batch)
            return loss, (acc, mutated["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        metrics = {"loss": loss, "acc": acc}
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else (),
                     static_argnums=(3,) if static_kwarg else ())
    if static_kwarg:
        return jitted
    return lambda state, batch, rng: jitted(state, batch, rng)


def make_eval_step(model, seg_size: tuple[int, int] | None = None):
    """Jitted inference: softmax probs at seg_size (static per-shape cache)."""

    @partial(jax.jit, static_argnames=("size",))
    def eval_step(state: TrainState, img, size):
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            img, train=False)
        return inference_probs(outs, size)

    if seg_size is not None:
        return lambda state, img: eval_step(state, img, seg_size)
    return eval_step
