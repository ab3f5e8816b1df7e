"""Microbench: stage-vmapped conv formulations on the real TPU.

Diagnoses the pp-stacked single-chip slowdown seen in pipeline_bench: times
forward and fwd+bwd of an 11-block Bottleneck chain vmapped over a P=2
stage axis with (a) TapConv (einsum taps), (b) plain Conv
(conv_general_dilated under vmap), and (c) the same chain unvmapped (P=1
flat, 2x batch) as the work-equivalent reference point.

Usage: python tools/tapconv_micro.py [--hw 17] [--mb 8] [--fwd-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=17)
    ap.add_argument("--mb", type=int, default=8)
    ap.add_argument("--k", type=int, default=11)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cvpr2021_vspw_implement_tpu.models import resnet
    from cvpr2021_vspw_implement_tpu.models.layers import Conv, TapConv
    from cvpr2021_vspw_implement_tpu.models.pipeline import BlockChain

    P, mb, hw, C = 2, args.mb, args.hw, 1024
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((P, mb, hw, hw, C))
                     .astype(np.float32))
    sw = jnp.ones((P,), jnp.float32)
    kw = dict(planes=256, dilation=2)

    def bench(name, conv_cls, vmapped=True):
        if vmapped:
            Stage = nn.vmap(BlockChain, in_axes=(0, 0), out_axes=0,
                            variable_axes={"params": 0, "batch_stats": 0},
                            split_rngs={"params": True})
            m = Stage(block=resnet.Bottleneck, k=args.k,
                      block_kwargs=tuple(sorted(
                          {**kw, "conv_cls": conv_cls}.items())),
                      train=True)
            v = m.init({"params": jax.random.PRNGKey(0)}, xs, sw)

            def f(params, x):
                out, _ = m.apply({"params": params["params"],
                                  "batch_stats": params["batch_stats"]},
                                 x, sw, mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2)
            arg = xs
        else:
            m = BlockChain(block=resnet.Bottleneck, k=args.k,
                           block_kwargs=tuple(sorted(
                               {**kw, "conv_cls": conv_cls}.items())),
                           train=True)
            xf = xs.reshape(P * mb, hw, hw, C)
            v = m.init({"params": jax.random.PRNGKey(0)}, xf,
                       jnp.ones((), jnp.float32))

            def f(params, x):
                out, _ = m.apply({"params": params["params"],
                                  "batch_stats": params["batch_stats"]},
                                 x, jnp.ones((), jnp.float32),
                                 mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32) ** 2)
            arg = xs.reshape(P * mb, hw, hw, C)

        for mode, fn in (("fwd", jax.jit(f)),
                         ("fwdbwd", jax.jit(jax.grad(f)))):
            out = fn(v, arg)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.perf_counter()
                out = fn(v, arg)
                float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"config": f"{name}_{mode}",
                              "ms": round(best * 1e3, 2)}), flush=True)

    bench("flat_conv", Conv, vmapped=False)
    bench("vmap_conv", Conv)
    bench("vmap_tapconv", TapConv)


if __name__ == "__main__":
    main()
