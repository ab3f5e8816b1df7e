"""Measure bf16-vs-f32 per-step loss drift of the jitted flagship train
step over N synthetic steps on the TPU (VERDICT r2 item 5).

The production recipe runs bf16 on TPU while the curve-parity oracle runs
f32 on CPU; this script closes the chain by bounding the bf16 deviation
of the SAME jitted step (identical weights, batches, RNG) over a long
horizon.  Records: per-step relative loss drift (mean/max), final-step
drift.  Result is written to stdout as one JSON line and appended to
PARITY.md by hand.

Usage: python tools/bf16_drift.py [steps] [crop]
"""

import json
import sys

import numpy as np


def main(steps: int = 100, crop: int = 128):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import (ClipPSP,
                                                             clip_psp_loss)
    from cvpr2021_vspw_implement_tpu.parallel import (TrainState,
                                                      make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    tb, bb = 4, 2
    batches = [
        {"img": rng.standard_normal((tb, bb, crop, crop, 3))
         .astype(np.float32),
         "labels": rng.integers(0, 124, (tb, bb, crop, crop))
         .astype(np.int32)}
        for _ in range(8)]  # cycled — drift is about arithmetic, not data

    losses = {}
    for name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        enc = ModelBuilder.build_encoder("resnet18dilated", fc_dim=512,
                                         dtype=dtype)
        model = ClipPSP(encoder=enc, num_class=124, fc_dim=512, dtype=dtype)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                jnp.zeros((tb, 1, 64, 64, 3), jnp.float32), train=True)
        variables = jax.device_put(variables, dev)
        tx = create_clip_optimizer(variables["params"], lr=0.002,
                                   max_iters=steps + 10)
        state = TrainState.create(variables, tx)
        step_fn = make_train_step(model, tx, loss_fn=clip_psp_loss,
                                  donate=False)
        key = jax.random.PRNGKey(0)
        ls = []
        for i in range(steps):
            b = batches[i % len(batches)]
            state, metrics = step_fn(
                state, {"img": jnp.asarray(b["img"]),
                        "labels": jnp.asarray(b["labels"])}, key)
            ls.append(float(metrics["loss"]))
        losses[name] = np.asarray(ls)
        print(f"{name}: first {ls[0]:.5f} last {ls[-1]:.5f}",
              file=sys.stderr, flush=True)

    rel = np.abs(losses["bf16"] - losses["f32"]) / np.maximum(
        np.abs(losses["f32"]), 1e-8)
    print(json.dumps({
        "steps": steps, "crop": crop,
        "rel_drift_mean": round(float(rel.mean()), 5),
        "rel_drift_max": round(float(rel.max()), 5),
        "rel_drift_final": round(float(rel[-1]), 5),
        "f32_final": round(float(losses["f32"][-1]), 5),
        "bf16_final": round(float(losses["bf16"][-1]), 5),
    }))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 100, int(a[1]) if len(a) > 1 else 128)
