"""Checkpoint save/restore of train-state pytrees.

Replaces the reference's ``torch.save(state_dict)`` pattern
(reference: train.py:167-188, train_clip2.py:179-189) with flax msgpack
serialization of the whole TrainState (params, BN stats, optimizer state,
step) — no ``module.`` prefix stripping, no strict=False holes.
"""

from __future__ import annotations

import os
import re

import jax
from flax import serialization


def save_checkpoint(ckpt_dir: str, state, epoch: int,
                    prefix: str = "model_epoch_") -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{prefix}{epoch}.msgpack")
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    return path


def load_checkpoint(path: str, target):
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def latest_checkpoint(ckpt_dir: str, prefix: str = "model_epoch_") -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    best_epoch = -1
    pat = re.compile(re.escape(prefix) + r"(\d+)\.msgpack$")
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best
