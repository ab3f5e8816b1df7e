"""Measure GPipe pipeline throughput, bubble overhead, and memory vs M.

VERDICT r2 item 8: models/pipeline.py proves equivalence but never measures.
This tool records, on the 8-virtual-device CPU mesh (and optionally the
single real TPU chip with stage-stacked params):

  * fwd+bwd wall time of the unpipelined ResNet-101 dilated trunk under
    pure data parallelism (dp8) — the baseline;
  * the same global batch under dp4 x pp2 GPipe with n_micro in {2, 4, 8};
  * the analytic GPipe bubble fraction (P-1)/(M+P-1) next to the observed
    slowdown, so schedule overhead is separable from bubble cost;
  * XLA's compiled temp-memory per config — the quantity an interleaved
    1F1B schedule would reduce (1F1B keeps O(P) microbatches of
    activations in flight instead of O(M); its bubble fraction is the
    SAME as GPipe's).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/pipeline_bench.py [--hw 65] [--mb 1] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

_TPU = "--tpu" in sys.argv
if not _TPU:
    # this image's sitecustomize forces jax_platforms=axon,cpu; override to
    # the virtual CPU mesh (see tests/conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=65)
    ap.add_argument("--mb", type=int, default=1,
                    help="per-data-shard microbatch size")
    ap.add_argument("--micro", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--tpu", action="store_true",
                    help="single-chip stage-stacked mode on the real TPU: "
                         "no mesh, measures schedule+TapConv overhead only")
    ap.add_argument("--schedule", default="gpipe",
                    choices=["gpipe", "1f1b"],
                    help="backward schedule of the pipelined tail "
                         "(models/pipeline.py)")
    ap.add_argument("--remat", action="store_true",
                    help="block-level nn.remat inside the trunk: the GPipe "
                         "memory lever (saved residuals shrink to block "
                         "boundaries; bwd recomputes block internals)")
    ap.add_argument("--compile_only", action="store_true",
                    help="report XLA memory analysis only (no execution) — "
                         "the temp-bytes column is a compile-time quantity "
                         "and the shared-core wall times are uninformative")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvpr2021_vspw_implement_tpu.models import resnet
    from cvpr2021_vspw_implement_tpu.models.pipeline import pipeline_variables
    from cvpr2021_vspw_implement_tpu.parallel import shard_tree
    from cvpr2021_vspw_implement_tpu.parallel.mesh import make_pipe_mesh

    devs = jax.devices()
    n_dev = len(devs)
    single = n_dev < 2 or args.tpu
    n_pipe = 2                      # layer3 tail = 22 blocks: P must divide 22
    n_data = 1 if single else n_dev // n_pipe
    hw = args.hw
    # same GLOBAL batch for every config
    gb = (max(args.micro) if single else n_dev) * args.mb

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((gb, hw, hw, 3)).astype(np.float32))

    base = resnet.resnet101(dilate_scale=8, remat=args.remat)
    vb = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(0)},
                                   jnp.zeros((1, hw, hw, 3)),
                                   train=True))()

    def sync(out):
        # block_until_ready does not synchronize through the axon TPU
        # tunnel (see bench.py); force a scalar readback of one leaf.
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf))

    def timed(fn, *a):
        if args.compile_only:
            return None
        sync(fn(*a))  # warm (compile + first execution)
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    def loss_fn(model):
        def f(params, stats, x):
            (outs), mut = model.apply({"params": params, "batch_stats": stats},
                                      x, train=True, mutable=["batch_stats"])
            return jnp.mean(outs[-1].astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(f))

    rows = []

    # ---------------- baseline: unpipelined (dp over the mesh, or one chip)
    if single:
        g = loss_fn(base)
        dt_base = timed(g, vb["params"], vb["batch_stats"], x)
        comp = g.lower(vb["params"], vb["batch_stats"], x).compile()
        mem_base = comp.memory_analysis()
        base_cfg = "flat_1chip"
    else:
        mesh_dp = make_pipe_mesh(n_dev, 1, devices=devs)
        with mesh_dp:
            vb_sh = shard_tree(vb, mesh_dp)
            xs = jax.device_put(x, NamedSharding(mesh_dp, P("data")))
            g = loss_fn(base)
            dt_base = timed(g, vb_sh["params"], vb_sh["batch_stats"], xs)
            comp = g.lower(vb_sh["params"], vb_sh["batch_stats"],
                           xs).compile()
            mem_base = comp.memory_analysis()
        base_cfg = f"dp{n_dev}"
    rows.append({"config": base_cfg + ("+remat" if args.remat else ""),
                 "step_ms": dt_base and round(dt_base * 1e3, 1),
                 "bubble_analytic": 0.0,
                 "temp_bytes_per_dev": getattr(mem_base, "temp_size_in_bytes",
                                               None)})

    # ---------------- pipelined: pp2, sweep n_micro ----------------
    for M in args.micro:
        # each microbatch (gb // M) must still shard evenly over 'data'
        if gb % M or (gb // M) % n_data:
            continue
        pipe = resnet.resnet101(dilate_scale=8, pipeline_stages=n_pipe,
                                pipeline_micro=M, remat=args.remat,
                                pipeline_schedule=args.schedule)
        vp = pipeline_variables(vb, n_tail=22, n_stages=n_pipe)
        if single:
            g = loss_fn(pipe)
            dt = timed(g, vp["params"], vp["batch_stats"], x)
            comp = g.lower(vp["params"], vp["batch_stats"], x).compile()
            mem = comp.memory_analysis()
            cfg = f"pp{n_pipe}_stacked_1chip M={M} {args.schedule}"
        else:
            mesh = make_pipe_mesh(n_data, n_pipe, devices=devs)
            with mesh:
                vp_sh = shard_tree(vp, mesh)
                xs = jax.device_put(x, NamedSharding(mesh, P("data")))
                g = loss_fn(pipe)
                dt = timed(g, vp_sh["params"], vp_sh["batch_stats"], xs)
                comp = g.lower(vp_sh["params"], vp_sh["batch_stats"],
                               xs).compile()
                mem = comp.memory_analysis()
            cfg = f"dp{n_data}xpp{n_pipe} M={M} {args.schedule}"
        rows.append({
            "config": cfg + ("+remat" if args.remat else ""),
            "step_ms": dt and round(dt * 1e3, 1),
            "vs_base": dt and round(dt / dt_base, 3),
            "bubble_analytic": round((n_pipe - 1) / (M + n_pipe - 1), 3),
            "temp_bytes_per_dev": getattr(mem, "temp_size_in_bytes", None),
        })

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
