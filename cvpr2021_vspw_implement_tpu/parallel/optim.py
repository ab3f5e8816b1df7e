"""Optimizers and LR schedules (torch-SGD-equivalent, optax-composed).

Replicates the reference's two optimizer recipes:
  * per-frame trainer (reference: train.py:191-238): SGD(momentum=beta1),
    weight decay only on conv/linear kernels (``group_weight``), poly LR
    ``lr * (1 - iter/max_iters)**0.9`` applied to both encoder and decoder
    (the reference's two optimizers share lr and schedule, so a single
    masked transform is mathematically identical);
  * clip trainer (reference: train_clip2.py:215-252): one SGD over four
    groups — encoder at 0.1x lr / heads at 1x, biases without weight decay
    (note: *BN scales do get decay* here, unlike the per-frame recipe),
    with ``--fix`` freezing the encoder entirely.

torch-SGD equivalence: d = grad + wd*p; v = mu*v + d; p -= lr*v — matches
``add_decayed_weights → trace(momentum) → per-group lr``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def poly_schedule(base_lr: float, max_iters: int, power: float = 0.9):
    def schedule(count):
        frac = 1.0 - count / max_iters
        return base_lr * jnp.maximum(frac, 0.0) ** power
    return schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def make_masks(params, decay_rule: str):
    """Build the weight-decay mask pytree.

    decay_rule:
      * "kernels"  — decay conv/linear kernels only (train.py group_weight)
      * "non_bias" — decay everything except biases (train_clip2 recipe)
    """
    def decay_leaf(path, _):
        name = _path_str(path)
        if decay_rule == "kernels":
            return name.endswith("kernel")
        if decay_rule == "non_bias":
            return not name.endswith("bias")
        raise ValueError(decay_rule)

    decay_mask = jax.tree_util.tree_map_with_path(decay_leaf, params)
    return decay_mask


def make_lr_mult(params, encoder_key: str = "encoder",
                 encoder_mult: float = 0.1,
                 frozen_prefixes: tuple = ("raft",)):
    """Per-param LR multipliers: 0.1x under the encoder, 0 for frozen
    subtrees (the RAFT flow net is loaded frozen — reference
    RAFT_core/raft.py:43-45 sets requires_grad=False, so those params never
    reach the optimizer)."""
    def mult_leaf(path, _):
        name = _path_str(path)
        for pref in frozen_prefixes:
            if name.startswith(pref) or f"/{pref}/" in name:
                return 0.0
        return encoder_mult if name.startswith(encoder_key) else 1.0
    return jax.tree_util.tree_map_with_path(mult_leaf, params)


def scale_by_tree(mult_tree):
    """Multiply each update by a static per-param factor (LR groups)."""
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, mult_tree)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def create_frame_optimizer(params, lr: float, max_iters: int,
                           momentum: float = 0.9, weight_decay: float = 1e-4,
                           lr_pow: float = 0.9):
    """Per-frame recipe (train.py): shared poly schedule, kernel-only decay."""
    decay_mask = make_masks(params, "kernels")
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        optax.trace(decay=momentum),
        optax.scale_by_schedule(
            lambda c: -poly_schedule(lr, max_iters, lr_pow)(c)),
    )


def create_clip_optimizer(params, lr: float, max_iters: int,
                          momentum: float = 0.9, weight_decay: float = 1e-4,
                          lr_pow: float = 0.9, fix_encoder: bool = False,
                          encoder_key: str = "encoder"):
    """Clip recipe (train_clip2.py): 0.1x encoder LR, non-bias decay.

    With ``fix_encoder`` the encoder's updates are zeroed (reference ``--fix``
    trains only the 10x groups).
    """
    decay_mask = make_masks(params, "non_bias")
    mult = make_lr_mult(params, encoder_key,
                        encoder_mult=0.0 if fix_encoder else 0.1)
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        optax.trace(decay=momentum),
        scale_by_tree(mult),
        optax.scale_by_schedule(
            lambda c: -poly_schedule(lr, max_iters, lr_pow)(c)),
    )
