"""Measure GPipe pipeline overhead vs the unpipelined trunk
(VERDICT r2 item 8: models/pipeline.py claims need numbers).

On the 8-virtual-device CPU mesh every device shares one core, so the
executor is effectively serialized and the pipelined/unpipelined WALL
ratio directly measures total-work overhead: the GPipe bubble
((P-1)/(M+P-1) of ticks carry no real microbatch) plus the shift/permute
and stacked-stage overheads.  On a real pod slice the same program's
per-device work drops by P; the ratio here bounds what the bubble costs.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python tools/pipeline_bench.py
Prints one JSON line per (P, M) configuration.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cvpr2021_vspw_implement_tpu.models import resnet
    from cvpr2021_vspw_implement_tpu.models.pipeline import (
        pipeline_variables)
    from cvpr2021_vspw_implement_tpu.parallel.mesh import make_pipe_mesh

    KW = dict(block=resnet.Bottleneck, layers=(1, 1, 9, 1), dilate_scale=8,
              stage_planes=(8, 16, 32, 64))
    N_TAIL = 8
    B, HW = 8, 64
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, HW, HW, 3)), jnp.float32)

    base = resnet.ResNetFeatures(**KW)
    base_vars = base.init({"params": jax.random.PRNGKey(0)},
                          x[:1], train=False)

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t)
        return best

    base_fn = jax.jit(lambda v, x: base.apply(v, x, train=False)[-1])
    t_base = timeit(base_fn, base_vars, x)
    print(json.dumps({"config": "unpipelined", "ms": round(t_base * 1e3, 1)}),
          flush=True)

    for p in (2, 4):
        for m in (1, 2, 4, 8):
            pipe = resnet.ResNetFeatures(**KW, pipeline_stages=p,
                                         pipeline_micro=m)
            vp = pipeline_variables(base_vars, N_TAIL, p)
            n_data = 8 // p
            mesh = make_pipe_mesh(n_data, p,
                                  devices=jax.devices()[:n_data * p])
            with mesh:
                fn = jax.jit(lambda v, x: pipe.apply(v, x, train=False)[-1])
                t = timeit(fn, vp, x)
            bubble = (p - 1) / (m + p - 1)
            print(json.dumps({
                "config": f"P={p},M={m}", "ms": round(t * 1e3, 1),
                "vs_unpipelined": round(t / t_base, 3),
                "theory_bubble": round(bubble, 3),
                "theory_ratio": round(1.0 / (1.0 - bubble), 3),
            }), flush=True)


if __name__ == "__main__":
    main()
