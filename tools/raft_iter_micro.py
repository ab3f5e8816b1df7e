"""Decompose the RAFT refinement iteration's on-device cost (TPU).

The netwarp train-step ablation puts one refinement iteration at ~5.4 ms
with the fused kernels on (ROADMAP round-3).  At the netwarp shape
(b=2, 60x60 positions, C<=384) the FLOP time of the whole iteration is
tens of microseconds, so the gap must be structural — this tool times
each stage STANDALONE inside a lax.scan(K) with a data dependence
between iterations (so nothing hoists), subtracts an empty-scan
baseline, and prints per-iteration milliseconds:

  * noop      — scan overhead floor
  * lookup    — Pallas 4-level corr pyramid lookup (ops/pallas/corr.py)
  * motion    — motion_encoder_fused
  * gru       — gru_flowhead_fused
  * chain     — lookup + motion + gru + coords update (the real body)
  * chain_xla — same chain with the XLA reference formulations

Usage: python tools/raft_iter_micro.py [--hw 60 60] [--b 2] [--k 50]
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
    ap.add_argument("--hw", type=int, nargs=2, default=[60, 60])
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--radius", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cvpr2021_vspw_implement_tpu.models.raft.corr import (
        build_corr_pyramid, lookup_corr_pyramid, lookup_corr_pyramid_onehot)
    from cvpr2021_vspw_implement_tpu.ops.pallas.corr import (
        lookup_corr_pyramid_fused)
    from cvpr2021_vspw_implement_tpu.ops.pallas.raft_update import (
        gru_flowhead_fused, gru_flowhead_xla, motion_encoder_fused,
        motion_encoder_xla)

    b, (h, w), r = args.b, args.hw, args.radius
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))

    fmap1 = f(b, h, w, 256).astype(jnp.bfloat16)
    fmap2 = f(b, h, w, 256).astype(jnp.bfloat16)
    pyramid = build_corr_pyramid(fmap1, fmap2, 4, store_dtype=jnp.bfloat16)

    ntap = 4 * (2 * r + 1) ** 2            # corr feature channels (324)
    cdt = jnp.bfloat16

    mp = {"convc1": (1, 1, ntap, 256), "convc2": (3, 3, 256, 192),
          "convf1": (7, 7, 2, 128), "convf2": (3, 3, 128, 64),
          "conv": (3, 3, 256, 126)}
    mp = {k: {"kernel": f(*s).astype(cdt), "bias": f(s[-1])}
          for k, s in mp.items()}
    cin = 128 + 256                        # hidden + [inp | motion]
    gp = {k: {"kernel": f(1, 5, cin, 128).astype(cdt), "bias": f(128)}
          for k in ("convz1", "convr1", "convq1")}
    gp.update({k: {"kernel": f(5, 1, cin, 128).astype(cdt), "bias": f(128)}
               for k in ("convz2", "convr2", "convq2")})
    gp["fh_conv1"] = {"kernel": f(3, 3, 128, 256).astype(cdt),
                      "bias": f(256)}
    gp["fh_conv2"] = {"kernel": f(3, 3, 256, 2).astype(cdt), "bias": f(2)}
    # the XLA reference formulation keeps conv dtypes uniform — give it a
    # bias-cast copy (the fused kernels take f32 biases by design)
    gp_xla = {k: {"kernel": v["kernel"], "bias": v["bias"].astype(cdt)}
              for k, v in gp.items()}

    gy = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    coords0 = jnp.stack([gx, gy], axis=-1)
    net0 = jnp.tanh(f(b, h, w, 128))
    inp = jax.nn.relu(f(b, h, w, 128))

    def scan_of(body, carry0):
        @jax.jit
        def run(carry0):
            carry, _ = jax.lax.scan(body, carry0, None, length=args.k)
            return jnp.sum(jax.tree_util.tree_leaves(carry)[0]
                           .astype(jnp.float32))
        return run, carry0

    def timed(run, c0):
        float(run(c0))
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            float(run(c0))
            best = min(best, time.perf_counter() - t0)
        return best / args.k * 1e3

    # tiny data dependence keeps every iteration live without real work
    def noop(c, _):
        return c + 1e-6 * jnp.sum(c), None

    def lookup_body(fn):
        def body(coords, _):
            corr = fn(pyramid, coords, r)
            # fold the lookup back into coords (keeps the chain honest)
            return coords + 1e-6 * jnp.mean(
                corr.astype(jnp.float32), axis=-1, keepdims=True), None
        return body

    def motion_body(fn):
        corr0 = f(b, h, w, ntap).astype(cdt)
        def body(flow, _):
            m = fn(corr0, flow.astype(cdt), mp)
            return 1e-3 * m[..., -2:].astype(jnp.float32), None
        return body, 1e-3 * f(b, h, w, 2)

    def gru_body(fn, cast_net=False):
        x0 = f(b, h, w, cin - 128).astype(cdt)
        gpp = gp_xla if cast_net else gp
        def body(net, _):
            net2, delta = fn(net.astype(cdt) if cast_net else net, x0, gpp)
            return net2.astype(jnp.float32) + 1e-6 * delta.sum(), None
        return body

    def chain_body(lookup, motion, gru, cast_net=False):
        def body(carry, _):
            net, coords = carry
            corr = lookup(pyramid, coords, r)
            flow = coords - coords0
            m = motion(corr.astype(cdt), flow.astype(cdt), mp)
            gin = jnp.concatenate([inp, m.astype(jnp.float32)], -1)
            net, delta = gru(net.astype(cdt) if cast_net else net,
                             gin.astype(cdt), gp_xla if cast_net else gp)
            return (net.astype(jnp.float32),
                    coords + delta.astype(jnp.float32)), None
        return body

    rows = {}
    run, c0 = scan_of(noop, jnp.float32(1.0))
    rows["noop"] = timed(run, c0)

    run, c0 = scan_of(lookup_body(lookup_corr_pyramid_fused), coords0)
    rows["lookup"] = timed(run, c0)
    run, c0 = scan_of(lookup_body(lookup_corr_pyramid), coords0)
    rows["lookup_xla"] = timed(run, c0)
    run, c0 = scan_of(lookup_body(lookup_corr_pyramid_onehot), coords0)
    rows["lookup_onehot"] = timed(run, c0)

    body, f0 = motion_body(motion_encoder_fused)
    run, c0 = scan_of(body, f0)
    rows["motion"] = timed(run, c0)
    body, f0 = motion_body(motion_encoder_xla)
    run, c0 = scan_of(body, f0)
    rows["motion_xla"] = timed(run, c0)

    run, c0 = scan_of(gru_body(gru_flowhead_fused), net0)
    rows["gru"] = timed(run, c0)
    run, c0 = scan_of(gru_body(gru_flowhead_xla, cast_net=True), net0)
    rows["gru_xla"] = timed(run, c0)

    run, c0 = scan_of(chain_body(lookup_corr_pyramid_fused,
                                 motion_encoder_fused, gru_flowhead_fused),
                      (net0, coords0))
    rows["chain"] = timed(run, c0)
    run, c0 = scan_of(chain_body(lookup_corr_pyramid, motion_encoder_xla,
                                 gru_flowhead_xla, cast_net=True),
                      (net0, coords0))
    rows["chain_xla"] = timed(run, c0)
    run, c0 = scan_of(chain_body(lookup_corr_pyramid_onehot,
                                 motion_encoder_fused, gru_flowhead_fused),
                      (net0, coords0))
    rows["chain_onehot"] = timed(run, c0)

    base = rows["noop"]
    print(json.dumps({k: round(v, 3) for k, v in rows.items()}
                     | {"k": args.k, "shape": f"b{b} {h}x{w}",
                        "net_ms": {k: round(v - base, 3)
                                   for k, v in rows.items() if k != "noop"}}))


if __name__ == "__main__":
    main()
