"""Per-step bf16 loss trace at several crops — locates where the 479^2
bf16 NaN (tools/bf16_drift.py, round 4) first appears."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import (ClipPSP,
                                                             clip_psp_loss)
    from cvpr2021_vspw_implement_tpu.parallel.optim import \
        create_clip_optimizer
    from cvpr2021_vspw_implement_tpu.parallel.train_state import (
        TrainState, make_train_step)

    dev = jax.devices()[0]
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    crops = [int(c) for c in sys.argv[2:]] or [320, 400, 479]

    enc = ModelBuilder.build_encoder("resnet101dilated", fc_dim=2048,
                                     dtype=jnp.bfloat16)
    model = ClipPSP(encoder=enc, num_class=124, fc_dim=2048,
                    dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((4, 1, 64, 64, 3), jnp.float32), train=True)
    variables = jax.device_put(variables, dev)

    for crop in crops:
        rng = np.random.default_rng(0)
        imgs = rng.standard_normal((4, 2, crop, crop, 3)).astype(np.float32)
        labels = rng.integers(-1, 124, (4, 2, crop, crop)).astype(np.int32)
        batch = {"img": jnp.asarray(imgs), "labels": jnp.asarray(labels)}
        tx = create_clip_optimizer(variables["params"], lr=0.002,
                                   max_iters=100)
        state = TrainState.create(variables, tx)
        step_fn = make_train_step(model, tx, loss_fn=clip_psp_loss,
                                  donate=False)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(steps):
            state, metrics = step_fn(state, batch, key)
            losses.append(float(metrics["loss"]))
        gn = [float(jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                                 for l in jax.tree_util.tree_leaves(
                                     state.params))))]
        print(f"crop {crop}: losses {['%.4f' % l for l in losses]} "
              f"param_l2 {gn[0]:.3e}", flush=True)


if __name__ == "__main__":
    main()
