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


def save_checkpoint_orbax(ckpt_dir: str, state, epoch: int) -> str:
    """Async-capable orbax backend (alternative to the msgpack default)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_epoch_{epoch}"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    return path


def load_checkpoint_orbax(path: str, target):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(path, item=jax.device_get(target))


class PreemptionCheckpointer:
    """Preemption-safe checkpointing (the reference has none — SURVEY §5:
    recovery is manual ``--resume_epoch``).  SIGTERM/SIGINT set a flag; the
    training loop calls ``maybe_save`` each step and saves once before
    exiting."""

    def __init__(self, ckpt_dir: str, prefix: str = "preempt_"):
        import signal

        self.ckpt_dir = ckpt_dir
        self.prefix = prefix
        self.requested = False
        self._orig = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._orig[sig] = signal.signal(sig, self._handler)
            except ValueError:
                pass  # non-main thread

    def _handler(self, signum, frame):
        self.requested = True

    def maybe_save(self, state, step: int) -> str | None:
        if not self.requested:
            return None
        path = save_checkpoint(self.ckpt_dir, state, step, prefix=self.prefix)
        return path


def newest_of(*paths: str | None) -> str | None:
    """The most recently written of the given checkpoint paths (an
    epoch-boundary save vs a mid-epoch preemption save — whichever
    happened last is where the run actually stopped)."""
    live = [p for p in paths if p]
    return max(live, key=os.path.getmtime) if live else None


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
