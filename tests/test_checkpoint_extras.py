"""Orbax backend + preemption checkpointing tests."""

import os
import signal

import jax.numpy as jnp
import numpy as np

from cvpr2021_vspw_implement_tpu.utils.checkpoint import (
    PreemptionCheckpointer, load_checkpoint_orbax, save_checkpoint_orbax)


def test_orbax_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.int32(3)}
    path = save_checkpoint_orbax(str(tmp_path), state, 1)
    restored = load_checkpoint_orbax(path, state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 3


def test_preemption_checkpointer(tmp_path):
    pc = PreemptionCheckpointer(str(tmp_path))
    state = {"w": jnp.ones((2,))}
    assert pc.maybe_save(state, 5) is None
    os.kill(os.getpid(), signal.SIGTERM)  # caught by the handler
    assert pc.requested
    path = pc.maybe_save(state, 5)
    assert path and os.path.exists(path)
