"""GPipe-style pipeline parallelism over homogeneous residual blocks.

The reference has no pipeline parallelism at all (its multi-GPU story is
single-process DataParallel, reference: train.py:305-311); on TPU pod
slices the deep dilated trunk of ResNet-101 — 22 identical bottleneck
blocks in layer3 after the downsample block, each [B, H/8, W/8, 1024] →
same shape — is the natural pipeline target: it carries ~2/3 of the
trunk's depth and FLOPs, and its blocks are shape-homogeneous, which is
exactly what a collective pipeline needs.

TPU-native formulation (pure GSPMD, no hand-written send/recv):

  * the P pipeline stages' parameters are STACKED on a leading axis via
    ``nn.vmap`` and sharded over the mesh 'pipe' axis — each device holds
    only its own stage's weights;
  * a [P, micro_batch, H, W, C] activation buffer is sharded over
    ('pipe', 'data'); the per-tick shift ``concat([new_input, buf[:-1]])``
    is a nearest-neighbour transfer that XLA lowers to a collective-permute
    riding the ICI;
  * each tick applies the vmapped stage chain — device p computes only its
    own slot — so compute, weights and activations all partition over
    'pipe' while the batch inside each microbatch still partitions over
    'data' (and BN batch stats still all-reduce over 'data' automatically).

Schedule: classic GPipe fill-and-drain, ``T = n_micro + n_stages - 1``
ticks, unrolled in Python (T is small and static).  Microbatch ``m``
enters stage 0 at tick ``m`` and leaves stage P-1 at tick ``m + P - 1``.

BatchNorm semantics: within the pipelined section, train-mode batch
statistics are per-microbatch (the standard GPipe behaviour — identical to
the unpipelined model when ``n_micro == 1``, which the equivalence tests
pin).  Bubble ticks (warmup/drain slots carrying no real microbatch) have
their running-stat updates zeroed via the ``stat_weight`` argument threaded
through the blocks, so garbage never leaks into running stats; eval mode
uses running stats and is bit-identical to the unpipelined model for ANY
``n_micro``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze, unfreeze


class BlockChain(nn.Module):
    """One pipeline stage: ``k`` sequential identical blocks.

    ``train`` is a (static) module field rather than a call argument so the
    lifted ``nn.vmap`` over stages only maps traced arrays."""

    block: type
    k: int
    block_kwargs: Any  # hashable tuple of block constructor kwargs
    train: bool = False

    @nn.compact
    def __call__(self, x, stat_weight):
        kwargs = dict(self.block_kwargs)
        # blocks with a pluggable conv get the einsum-tap conv: vmapped
        # conv_general_dilated miscompiles under the SPMD partitioner on
        # some backends (see layers.TapConv), and the taps are the MXU
        # shape anyway.  Param tree is identical either way.
        import dataclasses
        try:
            field_names = {f.name for f in dataclasses.fields(self.block)}
        except TypeError:
            field_names = ()
        if "conv_cls" in field_names:
            from .layers import TapConv
            kwargs.setdefault("conv_cls", TapConv)
        for j in range(self.k):
            x = self.block(**kwargs,
                           name=f"block{j}")(x, self.train, stat_weight)
        return x


def _maybe_shard_buf(x):
    """Constrain the pipeline buffer to ('pipe', 'data') when those axes
    exist on the ambient mesh; no-op otherwise (single-device tests)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        names = getattr(mesh, "axis_names", ()) or ()
        if "pipe" in names:
            from jax.sharding import PartitionSpec as P
            spec = P("pipe", "data" if "data" in names else None,
                     *([None] * (x.ndim - 2)))
            return jax.lax.with_sharding_constraint(x, spec)
    except Exception:
        pass
    return x


class PipelinedBlocks(nn.Module):
    """GPipe pipeline over ``n_blocks`` identical blocks split into
    ``n_stages`` stages of ``n_blocks // n_stages`` blocks each.

    ``schedule`` selects how the BACKWARD pass is produced:

    * ``"gpipe"`` — plain autodiff through the fill-and-drain forward.
      XLA keeps every stage-boundary activation of every microbatch live
      for the backward: O(M·P) microbatch-sized buffers (measured as the
      binding memory cost, ROADMAP "Pipeline measurements").
    * ``"1f1b"`` — a hand-scheduled backward (``nn.custom_vjp``): the
      forward saves ONLY the section inputs; the backward interleaves a
      stage-recompute wave (down) with the cotangent wave (up), exactly a
      1F1B wavefront, so at most ``2P`` microbatch-sized ring slots are
      live per stage — the SCHEDULE's activation footprint is O(P²·mb),
      independent of M.  Costs one extra forward recompute of the section
      (the same trade as block remat).  Losses and grads are
      bit-compatible with "gpipe" (same per-microbatch BN semantics; sums
      reassociated).

      MEASURED CAVEAT (round 4, TPU v5e, R101 tail, 129², P=2,
      stage-stacked single chip — ROADMAP "Pipeline measurements /
      round-4 TPU"): XLA's compiled temp-bytes for 1f1b come out only
      0.7% (M=4) / 4.0% (M=8) BELOW gpipe, not the structural O(M)->O(P)
      win the schedule admits — XLA already rematerializes/overlaps
      enough of the gpipe backward that the binding memory term is NOT
      the stage-boundary ring at this scale.  Treat 1f1b as a proven-
      equivalent alternative schedule, not a memory lever, until a
      multi-chip profile shows otherwise.
    """

    block: type
    n_blocks: int
    n_stages: int
    n_micro: int = 1
    block_kwargs: Any = None
    schedule: str = "gpipe"

    @nn.compact
    def __call__(self, x, train: bool = False):
        P_, M = self.n_stages, self.n_micro
        assert self.n_blocks % P_ == 0, (
            f"n_blocks={self.n_blocks} must divide into n_stages={P_}")
        assert self.schedule in ("gpipe", "1f1b"), self.schedule
        k = self.n_blocks // P_
        B = x.shape[0]
        # shape-independent params: fall back to M=1 when the (init-time or
        # odd-sized) batch is not divisible
        if B % M != 0:
            M = 1
        mb = B // M
        micro = x.reshape(M, mb, *x.shape[1:])

        chain_kwargs = dict(block=self.block, k=k,
                            block_kwargs=tuple(sorted(
                                (self.block_kwargs or {}).items())),
                            train=train)
        Stage = nn.vmap(
            BlockChain,
            in_axes=(0, 0), out_axes=0,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
        )
        stage = Stage(**chain_kwargs, name="stages")

        def run_fwd(mdl, mic):
            """Fill-and-drain forward; returns [M, mb, ...] outputs."""
            buf = jnp.zeros((P_, mb) + x.shape[1:], x.dtype)
            stage_idx = jnp.arange(P_)
            outs = []
            for t in range(M + P_ - 1):
                inp = mic[t] if t < M else jnp.zeros_like(mic[0])
                # shift-in: slot p receives slot p-1's activation — under a
                # 'pipe'-sharded buffer this is the inter-stage
                # collective-permute
                buf = jnp.concatenate(
                    [inp[None].astype(buf.dtype), buf[:-1]], 0)
                buf = _maybe_shard_buf(buf)
                # slot p carries microbatch t-p; weight 0 kills the
                # running-stat update on bubble slots (output is discarded)
                valid = ((t - stage_idx) >= 0) & ((t - stage_idx) < M)
                sw = valid.astype(jnp.float32)
                buf = mdl(buf, sw)
                if t >= P_ - 1:
                    outs.append(buf[-1])
            return jnp.stack(outs, 0)

        if self.schedule == "gpipe" or self.is_initializing() \
                or P_ == 1 and M == 1:
            out = run_fwd(stage, micro)
            return out.reshape(B, *out.shape[2:])

        section = nn.custom_vjp(
            lambda mdl, mic: run_fwd(mdl, mic),
            forward_fn=lambda mdl, mic: (run_fwd(mdl, mic),
                                         (mdl.variables, mic)),
            backward_fn=_make_1f1b_backward(chain_kwargs, P_, M, mb))
        out = section(stage, micro)
        return out.reshape(B, *out.shape[2:])


def _make_1f1b_backward(chain_kwargs, P_, M, mb):
    """Build the hand-scheduled 1F1B backward for the pipelined section.

    The forward saved only (stage variables snapshot, section-input
    microbatches).  The backward runs ``M + 2P - 1`` ticks; each tick does
    one vmapped stage-forward (the recompute wave, moving down) and one
    vmapped stage-vjp (the cotangent wave, moving up).  Stage ``p``
    recomputes microbatch ``m``'s input at tick ``m + p`` and consumes it
    for the vjp at tick ``m + 2P - 1 - p``, so a ring of ``S = 2P`` slots
    per stage bounds the live activations — the O(M) live-microbatch term
    of plain GPipe autodiff (ROADMAP "Pipeline measurements") becomes O(P).

    BN train-mode outputs depend only on the batch statistics of the input
    itself (never on running stats), so the recompute is exact; mutated
    stats inside the vjp are discarded (the forward already updated them).
    """
    chain = BlockChain(**chain_kwargs)
    S = 2 * P_

    def apply_chain(p, s, xx):
        y, _ = chain.apply({"params": p, "batch_stats": s}, xx,
                           jnp.float32(0.0), mutable=["batch_stats"])
        return y

    fwd_stage = jax.vmap(apply_chain)

    def vjp_one(p, s, xx, g):
        _, vjp_fn = jax.vjp(lambda pp, xi: apply_chain(pp, s, xi), p, xx)
        return vjp_fn(g)

    bwd_stage = jax.vmap(vjp_one)

    def backward(res, dout):
        snap, mic = res
        params = snap["params"]
        stats = snap.get("batch_stats", {})
        zeros_x = jnp.zeros_like(mic[0])
        buf_f = jnp.zeros((P_, mb) + mic.shape[2:], mic.dtype)
        buf_b = jnp.zeros((P_,) + dout.shape[1:], dout.dtype)
        ring = jnp.zeros((P_, S, mb) + mic.shape[2:], mic.dtype)
        grad = jax.tree_util.tree_map(jnp.zeros_like, params)
        dmic = [None] * M

        def upd(r, v, i):
            return jax.lax.dynamic_update_index_in_dim(r, v, i, 0)

        def pick(r, i):
            return jax.lax.dynamic_index_in_dim(r, i, 0, keepdims=False)

        for t in range(M + 2 * P_ - 1):
            # ---- cotangent wave (up) reads the ring BEFORE this tick's
            # recompute wave writes it (slot reuse is tightest at stage 0)
            if t >= P_:
                ridx = jnp.asarray([(t - 2 * P_ + 1 + p) % S
                                    for p in range(P_)])
                x_res = jax.vmap(pick)(ring, ridx)
                g_top = dout[t - P_] if 0 <= t - P_ < M \
                    else jnp.zeros_like(dout[0])
                buf_b = jnp.concatenate(
                    [buf_b[1:], g_top[None].astype(buf_b.dtype)], 0)
                buf_b = _maybe_shard_buf(buf_b)
                dp, dx = bwd_stage(params, stats, x_res,
                                   buf_b.astype(x_res.dtype))
                valid = jnp.asarray(
                    [1.0 if 0 <= t - 2 * P_ + 1 + p < M else 0.0
                     for p in range(P_)], mic.dtype)
                grad = jax.tree_util.tree_map(
                    lambda acc, d: acc + d * valid.reshape(
                        (P_,) + (1,) * (d.ndim - 1)).astype(d.dtype),
                    grad, dp)
                buf_b = dx * valid.reshape((P_,) + (1,) * (dx.ndim - 1))
                m0 = t - 2 * P_ + 1
                if 0 <= m0 < M:
                    dmic[m0] = buf_b[0]
            # ---- recompute wave (down), identical to the forward schedule
            if t < M + P_ - 1:
                inp = mic[t] if t < M else zeros_x
                buf_f = jnp.concatenate(
                    [inp[None].astype(buf_f.dtype), buf_f[:-1]], 0)
                buf_f = _maybe_shard_buf(buf_f)
                widx = jnp.asarray([(t - p) % S for p in range(P_)])
                ring = jax.vmap(upd)(ring, buf_f, widx)
                buf_f = fwd_stage(params, stats, buf_f)
        return ({"params": grad}, jnp.stack(dmic, 0).astype(mic.dtype))

    return backward


def stack_pipeline_params(tree, prefix: str, n_tail: int, n_stages: int,
                          pipe_name: str | None = None):
    """Convert standard per-block variables to the pipelined stacked layout.

    ``tree`` is one variable collection (e.g. ``variables['params']``) of a
    module whose dict (at any nesting depth) contains ``{prefix}_1`` ..
    ``{prefix}_{n_tail}`` block subtrees (the homogeneous tail; ``{prefix}_0``
    stays as-is).  They are grouped stage-major — stage ``p`` gets blocks
    ``p*k+1 .. p*k+k`` — stacked on a new leading axis, and re-rooted at
    ``{pipe_name}/stages/block{j}``.  Enables pipelined fine-tuning /
    serving from imported reference checkpoints.
    """
    pipe_name = pipe_name or f"{prefix}_pipe"
    k = n_tail // n_stages
    assert k * n_stages == n_tail

    def convert(d):
        if not isinstance(d, dict):
            return d
        if f"{prefix}_1" in d and f"{prefix}_{n_tail}" in d:
            out = {key: convert(v) for key, v in d.items()
                   if not any(key == f"{prefix}_{i}"
                              for i in range(1, n_tail + 1))}
            blocks = {}
            for j in range(k):
                per_stage = [d[f"{prefix}_{p * k + j + 1}"]
                             for p in range(n_stages)]
                # host-side numpy stack: the converters run on checkpoint
                # pytrees and must not dispatch device ops (the axon TPU
                # tunnel makes per-leaf device ops pathologically slow)
                blocks[f"block{j}"] = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]),
                    *per_stage)
            out[pipe_name] = {"stages": blocks}
            return out
        return {key: convert(v) for key, v in d.items()}

    if not isinstance(tree, dict) and not hasattr(tree, "unfreeze"):
        return tree
    was_frozen = hasattr(tree, "unfreeze")
    res = convert(unfreeze(tree) if was_frozen else dict(tree))
    return freeze(res) if was_frozen else res


def unstack_pipeline_params(tree, prefix: str, n_tail: int, n_stages: int,
                            pipe_name: str | None = None):
    """Inverse of :func:`stack_pipeline_params`."""
    pipe_name = pipe_name or f"{prefix}_pipe"
    k = n_tail // n_stages

    def convert(d):
        if not isinstance(d, dict):
            return d
        if pipe_name in d and "stages" in d.get(pipe_name, {}):
            out = {key: convert(v) for key, v in d.items() if key != pipe_name}
            blocks = d[pipe_name]["stages"]
            for p in range(n_stages):
                for j in range(k):
                    out[f"{prefix}_{p * k + j + 1}"] = \
                        jax.tree_util.tree_map(
                            lambda x, _p=p: np.asarray(x)[_p],
                            blocks[f"block{j}"])
            return out
        return {key: convert(v) for key, v in d.items()}

    if not isinstance(tree, dict) and not hasattr(tree, "unfreeze"):
        return tree
    was_frozen = hasattr(tree, "unfreeze")
    res = convert(unfreeze(tree) if was_frozen else dict(tree))
    return freeze(res) if was_frozen else res


def pipeline_variables(variables, n_tail: int, n_stages: int,
                       prefix: str = "layer3"):
    """Convert a full model's variables (params + batch_stats) from the
    standard block layout to the pipelined layout."""
    out = {}
    for coll, tree in (unfreeze(variables) if hasattr(variables, "unfreeze")
                       else dict(variables)).items():
        out[coll] = stack_pipeline_params(tree, prefix, n_tail, n_stages)
    return out


def unpipeline_variables(variables, n_tail: int, n_stages: int,
                         prefix: str = "layer3"):
    """Inverse of :func:`pipeline_variables`."""
    out = {}
    for coll, tree in (unfreeze(variables) if hasattr(variables, "unfreeze")
                       else dict(variables)).items():
        out[coll] = unstack_pipeline_params(tree, prefix, n_tail, n_stages)
    return out


def maybe_unpipeline(variables):
    """If ``variables`` carry a pipelined trunk (any ``<prefix>_pipe``
    subtree), convert them back to the standard per-block layout; no-op
    otherwise.  Stage count and blocks-per-stage are inferred from the
    stacked shapes, so eval drivers can consume checkpoints written by a
    pipelined trainer without knowing its mesh configuration."""

    def find(d):
        if not isinstance(d, dict):
            return None
        for key, v in d.items():
            if key.endswith("_pipe") and isinstance(v, dict) \
                    and "stages" in v:
                blocks = v["stages"]
                k = len(blocks)
                leaves = jax.tree_util.tree_leaves(blocks)
                n_stages = int(leaves[0].shape[0])
                return key[: -len("_pipe")], n_stages * k, n_stages
            found = find(v)
            if found:
                return found
        return None

    tree = (unfreeze(variables) if hasattr(variables, "unfreeze")
            else dict(variables))
    info = None
    for coll in tree.values():
        info = find(coll)
        if info:
            break
    if not info:
        return variables
    prefix, n_tail, n_stages = info
    return {coll: unstack_pipeline_params(t, prefix, n_tail, n_stages)
            for coll, t in tree.items()}
