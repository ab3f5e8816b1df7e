"""Sequence parallelism: TCB-PSP with clip frames sharded across devices
must match the unsharded step (the cross-frame pooled-stat blend becomes an
ICI psum of KB-scale statistics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP, clip_psp_loss
from cvpr2021_vspw_implement_tpu.parallel import (TrainState,
                                                  create_clip_optimizer,
                                                  make_train_step)
from cvpr2021_vspw_implement_tpu.parallel.mesh import make_seq_mesh

KEY = jax.random.PRNGKey(0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_clip_psp_seq_sharded_step_matches_unsharded():
    enc = ModelBuilder.build_encoder("resnet18dilated")
    model = ClipPSP(encoder=enc, num_class=5, fc_dim=512)

    rng = np.random.default_rng(0)
    t1, b = 4, 4
    imgs = jnp.asarray(rng.standard_normal((t1, b, 32, 32, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (t1, b, 32, 32)), jnp.int32)
    batch = {"img": imgs, "labels": labels}

    variables = model.init({"params": KEY, "dropout": KEY}, imgs, train=True)
    tx = create_clip_optimizer(variables["params"], lr=0.01, max_iters=100)
    step = make_train_step(model, tx, loss_fn=clip_psp_loss, donate=False)

    state0 = TrainState.create(variables, tx)
    ref_state, ref_m = step(state0, batch, KEY)

    mesh = make_seq_mesh(n_data=2, n_seq=2, n_model=2)
    sh = NamedSharding(mesh, P("seq", "data"))
    sbatch = {k: jax.device_put(v, sh) for k, v in batch.items()}
    sstate = TrainState.create(variables, tx)
    sstate, sm = step(sstate, sbatch, KEY)

    assert float(ref_m["loss"]) == pytest.approx(float(sm["loss"]), rel=3e-4)
    for a, c in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(sstate.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-4)
