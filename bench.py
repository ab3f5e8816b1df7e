"""Benchmark: flagship TCB-PSP (ResNet-101 dilated) — inference AND training.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Three measurements, all on the same chip, all with DISTINCT input frames so
XLA cannot hoist the encoder out of any loop (each scan step consumes its
own frame from a stacked [N,...] buffer):

1. ``value`` — streaming-inference target-frames/sec/chip (serving design:
   ONE encoder pass per video frame + pooled-stat blend + PPM fuse + argmax
   at VSPW-480p eval resolution 480x853, bf16).  Predictions are
   bit-identical to the reference window formulation (equivalence proof:
   tests/test_streaming.py).
2. ``baseline_frames_per_sec`` — the REFERENCE eval-loop formulation
   (test_clip2.py:28-89 re-encodes the whole (clip_num=3)+1-frame window for
   every eval frame), same model / same resolution / same bf16 / same chip.
   ``vs_baseline`` = (1)/(2): a *measured* apples-to-apples ratio that
   isolates the algorithmic win; no estimated GPU numbers in the headline.
   (For cross-hardware context only: the reference repo publishes no
   numbers — see BASELINE.md.)
3. ``train_step_ms`` — full jitted training step (fwd+bwd+SGD+BN stats) at
   the reference temporal recipe's per-GPU shape (scripts/run_temporal_psp.sh:
   batch 8 over 4 GPUs -> 2/chip, dilation2 "3,6,9" -> 3 context + 1 target
   frames, crop 479).  Measured as K back-to-back DONATED steps with ONE
   scalar readback at the end — the production dispatch pattern (training
   loops read metrics asynchronously); a single step timed with an inline
   readback folds the axon tunnel's ~18 ms host round trip into every
   sample and is reported separately as ``train_step_single_readback_ms``
   (tools/train_ablate.py has the full ablation matrix).

MFU fields use XLA's own compiled-HLO flop count divided by wall time and
the chip's bf16 peak; ``value`` is sanity-bounded by construction (mfu<=1).

Timing notes: under this image's axon TPU tunnel ``block_until_ready`` does
not synchronize, so every timed call forces a scalar readback.
"""

import json
import time


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12  # bf16
    if "v4" in kind:
        return 275e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v6" in kind:
        return 918e12
    return 197e12


def _flops_of(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


ERRORS = {}


def main():
    import jax

    # persistent compile cache: the axon tunnel's remote compile of the
    # R101 graphs takes minutes; later runs load the cached executables
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import (
        ClipPSP, clip_psp_loss)
    from cvpr2021_vspw_implement_tpu.models.segmentation import inference_pred
    from cvpr2021_vspw_implement_tpu.parallel import (
        TrainState, make_train_step)
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)

    dev = jax.devices()[0]
    peak = _peak_flops(dev)

    enc = ModelBuilder.build_encoder("resnet101dilated", dtype=jnp.bfloat16)
    model = ClipPSP(encoder=enc, num_class=124, fc_dim=2048,
                    dtype=jnp.bfloat16)

    h, w = 480, 853
    rng = np.random.default_rng(0)
    # init on the host CPU backend: dispatching hundreds of tiny param-init
    # ops through the TPU tunnel costs minutes; the params transfer once
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                               train=False)
    variables = jax.device_put(variables, dev)

    # ---------------- 1. streaming inference, N DISTINCT frames ------------
    # N amortizes the measured ~30-40 ms host<->chip round-trip of each
    # timed execution through the axon tunnel (a trivial jitted program
    # costs that much wall time); the window baseline below scales M for
    # the same reason, so the ratio stays apples-to-apples.
    N = 64
    frames = jnp.asarray(
        rng.standard_normal((N, 1, h, w, 3)).astype(np.float32))

    def one_frame(blended_prev, img):
        """Per-frame streaming work: encode + blend + fuse + argmax.

        blended_prev stands in for the cached context stats (their blend is
        a trivial mean of <=6x6xC arrays, included here)."""
        c5, pooled = model.apply(variables, img, train=False,
                                 method=model.encode_frame)
        blended = [jnp.mean(jnp.stack([p, q]), 0)
                   for p, q in zip(pooled, blended_prev)]
        logits = model.apply(variables, c5, blended, train=False,
                             method=model.fuse_target)
        pred = inference_pred((logits,), (h, w))
        return pooled, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))

    @jax.jit
    def run_stream(frames, blended0):
        carry, sums = jax.lax.scan(one_frame, blended0, frames)
        return carry, jnp.sum(sums)

    pooled0 = [jnp.zeros((1, s, s, 2048), jnp.bfloat16) for s in (1, 2, 3, 6)]
    stream_c = jax.jit(run_stream).lower(frames, pooled0).compile()
    # flop count: XLA's cost analysis counts a scan body ONCE, so count a
    # standalone per-frame step and multiply by N
    per_frame_flops = _flops_of(
        jax.jit(one_frame).lower(pooled0, frames[0]).compile())
    stream_flops = per_frame_flops * N if per_frame_flops else None
    pooled, s = stream_c(frames, pooled0)
    float(s)  # first execution

    stream_fps, stream_dt = 0.0, float("inf")
    for _trial in range(3):
        start = time.perf_counter()
        pooled, s = stream_c(frames, pooled0)
        float(s)
        dt = time.perf_counter() - start
        if dt < stream_dt:
            stream_fps, stream_dt = N / dt, dt

    stream_mfu = (stream_flops / stream_dt / peak
                  if stream_flops else None)

    # -------- 1b. multi-stream serving throughput (4 videos/chip) ----------
    # batching independent streams through the per-frame step lifts MFU;
    # guarded so a failure never loses the primary metrics.
    stream4_fps = None
    try:
        B4 = 4
        frames4 = jnp.asarray(
            rng.standard_normal((N, B4, h, w, 3)).astype(np.float32))

        def one4(blended_prev, img):
            c5, pooled = model.apply(variables, img, train=False,
                                     method=model.encode_frame)
            blended = [jnp.mean(jnp.stack([p, q]), 0)
                       for p, q in zip(pooled, blended_prev)]
            logits = model.apply(variables, c5, blended, train=False,
                                 method=model.fuse_target)
            pred = inference_pred((logits,), (h, w))
            return pooled, jnp.sum(pred[:, ::97, ::97].astype(jnp.int32))

        @jax.jit
        def run4(frames, b0):
            _, s = jax.lax.scan(one4, b0, frames)
            return jnp.sum(s)

        b04 = [jnp.zeros((B4, s, s, 2048), jnp.bfloat16)
               for s in (1, 2, 3, 6)]
        float(run4(frames4, b04))
        best4 = float("inf")
        for _trial in range(3):
            start = time.perf_counter()
            float(run4(frames4, b04))
            best4 = min(best4, time.perf_counter() - start)
        stream4_fps = round(N * B4 / best4, 3)
        # free the 1.26 GB stack BEFORE the next section compiles (see the
        # lazy-frames4 note below)
        del frames4, b04
    except Exception:
        pass

    # -------- 1b2. opt-in int8 quantized streaming (--serve_dtype int8:
    # wide spatial convs as s8xs8->s32 with dynamic activation quant —
    # ops/quant.py; an accuracy trade, reported alongside, never the
    # headline). --------
    int8_fps = None
    try:
        from cvpr2021_vspw_implement_tpu.ops.quant import int8_trunk

        @jax.jit
        def run_int8(frames, blended0):
            def step(blended_prev, img):
                with int8_trunk():
                    c5, pooled = model.apply(variables, img, train=False,
                                             method=model.encode_frame)
                    blended = [jnp.mean(jnp.stack([p, q]), 0)
                               for p, q in zip(pooled, blended_prev)]
                    logits = model.apply(variables, c5, blended,
                                         train=False,
                                         method=model.fuse_target)
                pred = inference_pred((logits,), (h, w))
                return pooled, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))
            _, sums = jax.lax.scan(step, blended0, frames)
            return jnp.sum(sums)

        float(run_int8(frames, pooled0))
        best8 = float("inf")
        for _trial in range(3):
            start = time.perf_counter()
            float(run_int8(frames, pooled0))
            best8 = min(best8, time.perf_counter() - start)
        int8_fps = round(N / best8, 3)
    except Exception:
        pass

    # -------- 1c. width-bucketed masked streaming (the PRODUCTION eval
    # path: test_clip.py --width_bucket 64 pads 480x853 to the 512x896
    # bucket and passes the true size as runtime scalars; the masked
    # kernels re-zero at every Conv/BN boundary — ops/masked.py).  This
    # row measures that overhead vs the exact-shape kernel above. --------
    stream_bk_fps = None
    try:
        from cvpr2021_vspw_implement_tpu.models.segmentation import (
            inference_pred_rt)
        from cvpr2021_vspw_implement_tpu.ops.masked import (bucket_hw,
                                                            feature_valid)
        hp, wp = bucket_hw(h, w)
        frames_p = jnp.pad(frames, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w), (0, 0)))

        @jax.jit
        def run_bk(frames_p, blended0, hv, wv):
            def step(blended_prev, img):
                c5, pooled = model.apply(variables, img, train=False,
                                         valid_hw=(hv, wv),
                                         method=model.encode_frame)
                blended = [jnp.mean(jnp.stack([p, q]), 0)
                           for p, q in zip(pooled, blended_prev)]
                fv = feature_valid(c5.shape[1], c5.shape[2], (hv, wv),
                                   (hp, wp))
                logits = model.apply(variables, c5, blended, train=False,
                                     feat_valid=fv,
                                     method=model.fuse_target)
                pred = inference_pred_rt((logits,), (hp, wp), fv, (hv, wv))
                return pooled, jnp.sum(
                    pred[0, ::97, ::97].astype(jnp.int32))

            carry, sums = jax.lax.scan(step, blended0, frames_p)
            return jnp.sum(sums)

        hv, wv = jnp.int32(h), jnp.int32(w)
        float(run_bk(frames_p, pooled0, hv, wv))
        times = []
        for _trial in range(3):
            start = time.perf_counter()
            float(run_bk(frames_p, pooled0, hv, wv))
            times.append(time.perf_counter() - start)
        stream_bk_fps = round(N / min(times), 3)
        del frames_p
    except Exception as e:  # recorded, not swallowed
        ERRORS["stream_bucketed"] = repr(e)[:160]

    # -------- 1d. eval-shape policy on a width MIX (VERDICT r4 #1) --------
    # VSPW-val-shaped workload: several distinct widths, constant shape per
    # video.  'exact' compiles one kernel per width (amortized across that
    # width's videos and, via the persistent cache, across runs); the
    # bucketed-masked path shares one kernel per 64-px bucket at a
    # per-frame tax.  Steady-state effective f/s over the mix under each
    # policy; compile costs are measured in tools/eval_policy_micro.py.
    policy_exact_mix_fps = policy_bucketed_mix_fps = None
    try:
        from cvpr2021_vspw_implement_tpu.models.segmentation import (
            inference_pred_rt as _ip_rt)
        from cvpr2021_vspw_implement_tpu.ops.masked import (
            bucket_hw as _bhw, feature_valid as _fvalid)
        MIXW, NW = (704, 853), 32
        tot_e = tot_b = 0.0
        for wmix in MIXW:
            frmix = jnp.asarray(rng.standard_normal(
                (NW, 1, h, wmix, 3)).astype(np.float32))

            def one_e(blended_prev, img, _w=wmix):
                c5, pooled = model.apply(variables, img, train=False,
                                         method=model.encode_frame)
                blended = [jnp.mean(jnp.stack([p, q]), 0)
                           for p, q in zip(pooled, blended_prev)]
                logits = model.apply(variables, c5, blended, train=False,
                                     method=model.fuse_target)
                pred = inference_pred((logits,), (h, _w))
                return pooled, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))

            @jax.jit
            def run_e(fr, b0):
                _, sums = jax.lax.scan(one_e, b0, fr)
                return jnp.sum(sums)

            float(run_e(frmix, pooled0))
            best = float("inf")
            for _t in range(3):
                t0 = time.perf_counter()
                float(run_e(frmix, pooled0))
                best = min(best, time.perf_counter() - t0)
            tot_e += best

            hpm, wpm = _bhw(h, wmix)
            frp = jnp.pad(frmix, ((0, 0), (0, 0), (0, hpm - h),
                                  (0, wpm - wmix), (0, 0)))

            @jax.jit
            def run_b(fr, b0, hv, wv, _pad=(hpm, wpm)):
                def step(blended_prev, img):
                    c5, pooled = model.apply(variables, img, train=False,
                                             valid_hw=(hv, wv),
                                             method=model.encode_frame)
                    blended = [jnp.mean(jnp.stack([p, q]), 0)
                               for p, q in zip(pooled, blended_prev)]
                    fv = _fvalid(c5.shape[1], c5.shape[2], (hv, wv), _pad)
                    logits = model.apply(variables, c5, blended,
                                         train=False, feat_valid=fv,
                                         method=model.fuse_target)
                    pred = _ip_rt((logits,), _pad, fv, (hv, wv))
                    return pooled, jnp.sum(
                        pred[0, ::97, ::97].astype(jnp.int32))
                _, sums = jax.lax.scan(step, b0, fr)
                return jnp.sum(sums)

            float(run_b(frp, pooled0, jnp.int32(h), jnp.int32(wmix)))
            best = float("inf")
            for _t in range(3):
                t0 = time.perf_counter()
                float(run_b(frp, pooled0, jnp.int32(h), jnp.int32(wmix)))
                best = min(best, time.perf_counter() - t0)
            tot_b += best
            del frmix, frp
        policy_exact_mix_fps = round(len(MIXW) * NW / tot_e, 3)
        policy_bucketed_mix_fps = round(len(MIXW) * NW / tot_b, 3)
    except Exception as e:  # recorded, not swallowed
        ERRORS["eval_policy_mix"] = repr(e)[:160]

    # ------------- 2. reference window formulation, same chip --------------
    # test_clip2.py re-encodes clip_num+1 = 4 frames per eval frame; scan
    # over M distinct windows (each its own 4 frames) so nothing hoists.
    M = 16
    windows = jnp.asarray(
        rng.standard_normal((M, 4, 1, h, w, 3)).astype(np.float32))

    def one_window(_, win):
        outs = model.apply(variables, win, train=False)
        pred = inference_pred(outs, (h, w))
        return 0, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))

    @jax.jit
    def run_window(windows):
        _, sums = jax.lax.scan(one_window, 0, windows)
        return jnp.sum(sums)

    window_c = jax.jit(run_window).lower(windows).compile()
    per_window_flops = _flops_of(
        jax.jit(one_window).lower(0, windows[0]).compile())
    window_flops = per_window_flops * M if per_window_flops else None
    float(window_c(windows))

    base_fps, base_dt = 0.0, float("inf")
    for _trial in range(3):
        start = time.perf_counter()
        s = window_c(windows)
        float(s)
        dt = time.perf_counter() - start
        if dt < base_dt:
            base_fps, base_dt = M / dt, dt
    base_mfu = (window_flops / base_dt / peak if window_flops else None)

    # the streaming sections' buffers are dead from here on; free them so
    # the training/netwarp compiles don't OOM against 64-frame f32 stacks
    # (frames4 alone is ~1.3 GB) still resident in HBM
    del frames, windows, window_c, stream_c
    try:
        del frames4, b04
    except NameError:
        pass

    # ---------------- 3. training step, reference per-chip shape -----------
    tb, bb, crop = 4, 2, 479
    imgs = jnp.asarray(
        rng.standard_normal((tb, bb, crop, crop, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 124, (tb, bb, crop, crop)),
                         jnp.int32)
    batch = {"img": imgs, "labels": labels}
    with jax.default_device(jax.devices("cpu")[0]):
        tvars = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                           train=True)
    tvars = jax.device_put(tvars, dev)
    tx = create_clip_optimizer(tvars["params"], lr=0.002, max_iters=100)
    state = TrainState.create(tvars, tx)
    step_fn = make_train_step(model, tx, loss_fn=clip_psp_loss, donate=False)

    key = jax.random.PRNGKey(0)
    new_state, metrics = step_fn(state, batch, key)
    float(metrics["loss"])  # compile + first execution
    train_single_dt = float("inf")
    for _trial in range(3):
        start = time.perf_counter()
        new_state, metrics = step_fn(state, batch, key)
        float(metrics["loss"])
        train_single_dt = min(train_single_dt, time.perf_counter() - start)
    # flop count for the jitted step via a fresh lowering (cached)
    train_flops = None
    try:
        lowered = jax.jit(
            lambda s, b, k: step_fn(s, b, k)).lower(state, batch, key)
        train_flops = _flops_of(lowered.compile())
    except Exception as e:  # recorded, not swallowed
        ERRORS["train_flops"] = repr(e)[:160]

    def chained_ms(sfn, st, bt, k=8, trials=3):
        """K donated back-to-back steps, one readback (production dispatch);
        returns best ms/step.  State rebinds each step; the losses are
        summed on-device so only ONE scalar crosses the tunnel."""
        st, m = sfn(st, bt, key)
        float(m["loss"])
        best = float("inf")
        for _trial in range(trials):
            t0 = time.perf_counter()
            losses = []
            for _i in range(k):
                st, m = sfn(st, bt, key)
                losses.append(m["loss"])
            float(jnp.sum(jnp.stack(losses)))
            best = min(best, (time.perf_counter() - t0) / k)
        return best * 1e3

    step_don = make_train_step(model, tx, loss_fn=clip_psp_loss, donate=True)
    # donate a deep COPY so `state` stays alive for the b=4 row below
    state_c = jax.tree_util.tree_map(lambda x: x.copy(), state)
    train_dt = chained_ms(step_don, state_c, batch) / 1e3
    del state_c
    train_mfu = (train_flops / train_dt / peak if train_flops else None)

    # -------- 3b. throughput-optimal per-chip batch (b=4, no remat) --------
    # the reference recipe is 2/chip; v5e HBM fits 4/chip without remat and
    # gains ~11% per-sample throughput (see ROADMAP ablation).  Guarded.
    train_b4_ms_per2 = None
    try:
        imgs4 = jnp.concatenate([imgs] * 2, 1)
        labels4 = jnp.concatenate([labels] * 2, 1)
        batch4 = {"img": imgs4, "labels": labels4}
        state_c = jax.tree_util.tree_map(lambda x: x.copy(), state)
        train_b4_ms_per2 = round(
            chained_ms(step_don, state_c, batch4) / 2, 2)
        del state_c
    except Exception as e:  # recorded, not swallowed
        ERRORS["train_b4"] = repr(e)[:160]

    # flagship train buffers are dead past here
    del new_state, metrics, batch, imgs, labels, state, tvars

    # ---------------- 4. NetWarp training step (flow-coupled method) -------
    # frozen 20-iter RAFT + R101 + warps at the reference per-chip shape;
    # exercises the Pallas corr-lookup kernel (ops/pallas/corr.py) inside
    # the jitted step.  Guarded: a failure here must not lose the primary
    # metrics.
    netwarp_ms = netwarp_train_mfu = None
    try:
        from cvpr2021_vspw_implement_tpu.models.netwarp import (
            NetWarp, netwarp_loss)
        nenc = ModelBuilder.build_encoder("resnet101dilated",
                                          dtype=jnp.bfloat16)
        nmodel = NetWarp(encoder=nenc, num_class=124, fc_dim=2048,
                         raft_iters=20, dtype=jnp.bfloat16)
        nimgs = jnp.asarray(
            rng.standard_normal((2, bb, crop, crop, 3)).astype(np.float32))
        nlabels = jnp.asarray(rng.integers(0, 124, (2, bb, crop, crop)),
                              jnp.int32)
        nbatch = {"img": nimgs, "labels": nlabels}
        with jax.default_device(jax.devices("cpu")[0]):
            nvars = nmodel.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                jnp.zeros((2, 1, 64, 64, 3), jnp.float32),
                                train=True)
        nvars = jax.device_put(nvars, dev)
        ntx = create_clip_optimizer(nvars["params"], lr=0.002, max_iters=100)
        nstate = TrainState.create(nvars, ntx)
        # flops BEFORE the donating chain consumes the state buffers
        nw_train_flops = None
        try:
            nstep_nd = make_train_step(nmodel, ntx, loss_fn=netwarp_loss,
                                       donate=False)
            nw_train_flops = _flops_of(jax.jit(
                lambda s, b, k: nstep_nd(s, b, k)).lower(
                    nstate, nbatch, key).compile())
        except Exception as e:
            ERRORS["netwarp_flops"] = repr(e)[:160]
        nstep = make_train_step(nmodel, ntx, loss_fn=netwarp_loss,
                                donate=True)
        netwarp_ms = round(chained_ms(nstep, nstate, nbatch, k=4), 1)
        netwarp_train_mfu = (nw_train_flops / (netwarp_ms / 1e3) / peak
                             if nw_train_flops else None)
    except Exception as e:  # recorded, not swallowed
        ERRORS["netwarp"] = repr(e)[:160]

    # ---------------- 4b. ETC training step (flow-regularized) -------------
    # per-pair ST-loss with the frozen 20-iter RAFT inside the jitted step
    # (reference run_etc.sh recipe shape)
    etc_train_ms = etc_train_mfu = None
    try:
        import functools as _ft

        from cvpr2021_vspw_implement_tpu.models.etc import (ETC as _ETC,
                                                            etc_loss)
        etenc = ModelBuilder.build_encoder("resnet101dilated",
                                           dtype=jnp.bfloat16)
        etmodel = _ETC(encoder=etenc, num_class=124, fc_dim=2048,
                       raft_iters=20, dtype=jnp.bfloat16)
        etimgs = jnp.asarray(
            rng.standard_normal((2, bb, crop, crop, 3)).astype(np.float32))
        etlabels = jnp.asarray(rng.integers(0, 124, (2, bb, crop, crop)),
                               jnp.int32)
        etbatch = {"img": etimgs, "labels": etlabels}
        with jax.default_device(jax.devices("cpu")[0]):
            etvars = etmodel.init({"params": jax.random.PRNGKey(0),
                                   "dropout": jax.random.PRNGKey(1)},
                                  jnp.zeros((2, 1, 64, 64, 3), jnp.float32),
                                  train=True)
        etvars = jax.device_put(etvars, dev)
        ettx = create_clip_optimizer(etvars["params"], lr=0.002,
                                     max_iters=100)
        etstate = TrainState.create(etvars, ettx)
        etloss = _ft.partial(etc_loss, deep_sup_scale=0.4, st_weight=0.1)
        et_flops = None
        try:
            etstep_nd = make_train_step(etmodel, ettx, loss_fn=etloss,
                                        donate=False)
            et_flops = _flops_of(jax.jit(
                lambda s, b, k: etstep_nd(s, b, k)).lower(
                    etstate, etbatch, key).compile())
        except Exception as e:
            ERRORS["etc_train_flops"] = repr(e)[:160]
        etstep = make_train_step(etmodel, ettx, loss_fn=etloss, donate=True)
        etc_train_ms = round(chained_ms(etstep, etstate, etbatch, k=4), 1)
        etc_train_mfu = (et_flops / (etc_train_ms / 1e3) / peak
                         if et_flops else None)
        del etvars, etstate, etbatch, etimgs, etlabels
    except Exception as e:  # recorded, not swallowed
        ERRORS["etc_train"] = repr(e)[:160]

    # training states are dead; re-create the single-stream frame stack the
    # per-method serving sections scan over (freed above to keep the train
    # sections inside HBM).  The 4-stream stacks (1.26 GB f32 each) are
    # allocated LAZILY inside each 4-stream row and freed right after:
    # round 3's ClipOCR single-stream row measured 2.5x slow (68 vs the
    # 174 f/s the same kernel does in isolation — VERDICT r4 item 1), and
    # keeping dead GB-scale buffers resident while XLA compiles the next
    # program is the prime suspect (less free HBM -> worse schedule, and
    # the persistent compile cache then pins the bad executable).
    try:
        del nvars, nstate, nbatch, nimgs, nlabels
    except NameError:
        pass
    B4 = 4
    frames = jnp.asarray(
        rng.standard_normal((N, 1, h, w, 3)).astype(np.float32))

    def make_frames4():
        return jnp.asarray(
            rng.standard_normal((N, B4, h, w, 3)).astype(np.float32))

    SPREADS = {}

    def timed_stream(step, carry0, frames, n_frames, row=None, trials=3):
        """Best-of-``trials`` wall time of a jitted scan over distinct
        frames → (frames/sec, best seconds).  Records the cross-trial
        spread (worst/best - 1, %) under ``row`` so cross-run instability
        like the round-3 ClipOCR contradiction is visible in the
        artifact."""
        @jax.jit
        def run(frames, c0):
            c, sums = jax.lax.scan(step, c0, frames)
            return jnp.sum(sums)

        float(run(frames, carry0))
        times = []
        for _trial in range(trials):
            start = time.perf_counter()
            float(run(frames, carry0))
            times.append(time.perf_counter() - start)
        best = min(times)
        if row is not None:
            SPREADS[row] = round(100.0 * (max(times) / best - 1.0), 1)
        return n_frames / best, best

    # ------- 5. ClipOCR streaming (region-context blend; memory-free) ------
    clipocr_fps = clipocr_mfu = clipocr4_fps = clipocr_bk_fps = None
    try:
        from cvpr2021_vspw_implement_tpu.models.clip_ocr import ClipOCRNet
        oenc = ModelBuilder.build_encoder("resnet101dilated",
                                          dtype=jnp.bfloat16)
        omodel = ClipOCRNet(encoder=oenc, num_class=124,
                            dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            ovars = omodel.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                                train=False)
        ovars = jax.device_put(
            {"params": ovars["params"],
             "batch_stats": ovars.get("batch_stats", {})}, dev)

        def ocr_step(ctx_prev, img):
            feat, ctx = omodel.apply(ovars, img, train=False,
                                     method=omodel.encode_frame)
            blended = jnp.mean(jnp.stack([ctx, ctx_prev]), 0)
            logits = omodel.apply(ovars, feat, blended, train=False,
                                  method=omodel.fuse_target)
            pred = inference_pred((logits,), (h, w))
            return ctx, jnp.sum(pred[:, ::97, ::97].astype(jnp.int32))

        ctx0 = jnp.zeros((1, 124, 512), jnp.bfloat16)
        clipocr_fps, dt = timed_stream(ocr_step, ctx0, frames, N,
                                       row="clipocr", trials=5)
        fl = _flops_of(jax.jit(ocr_step).lower(ctx0, frames[0]).compile())
        clipocr_mfu = fl * N / dt / peak if fl else None
        ctx04 = jnp.zeros((B4, 124, 512), jnp.bfloat16)
        frames4 = make_frames4()
        clipocr4_fps, _ = timed_stream(ocr_step, ctx04, frames4, N * B4,
                                       row="clipocr4")
        del frames4

        # bucketed masked streaming (production eval path, see 1c)
        from cvpr2021_vspw_implement_tpu.models.segmentation import (
            inference_pred_rt)
        from cvpr2021_vspw_implement_tpu.ops.masked import (bucket_hw,
                                                            feature_valid)
        hp, wp = bucket_hw(h, w)
        frames_p = jnp.pad(frames, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w), (0, 0)))

        @jax.jit
        def run_ocr_bk(frames_p, ctx0, hv, wv):
            def step(ctx_prev, img):
                feat, ctx = omodel.apply(ovars, img, train=False,
                                         valid_hw=(hv, wv),
                                         method=omodel.encode_frame)
                blended = jnp.mean(jnp.stack([ctx, ctx_prev]), 0)
                logits = omodel.apply(ovars, feat, blended, train=False,
                                      method=omodel.fuse_target)
                fv = feature_valid(feat.shape[1], feat.shape[2],
                                   (hv, wv), (hp, wp))
                pred = inference_pred_rt((logits,), (hp, wp), fv, (hv, wv))
                return ctx, jnp.sum(pred[:, ::97, ::97].astype(jnp.int32))

            _, sums = jax.lax.scan(step, ctx0, frames_p)
            return jnp.sum(sums)

        hv, wv = jnp.int32(h), jnp.int32(w)
        float(run_ocr_bk(frames_p, ctx0, hv, wv))
        times = []
        for _trial in range(3):
            start = time.perf_counter()
            float(run_ocr_bk(frames_p, ctx0, hv, wv))
            times.append(time.perf_counter() - start)
        clipocr_bk_fps = round(N / min(times), 3)
        del frames_p
    except Exception as e:  # recorded, not swallowed
        ERRORS["clipocr"] = repr(e)[:160]

    # ------- 6. TDNet streaming (K/V/Q carry, rotating paths) --------------
    tdnet_fps = tdnet_mfu = tdnet4_fps = tdnet_bk_fps = None
    try:
        from cvpr2021_vspw_implement_tpu.models.td4_psp import (
            TD4PSP, init_td4_state)
        tmodel = TD4PSP(num_class=124, dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            tvars2 = tmodel.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                jnp.zeros((4, 1, 64, 64, 3), jnp.float32), train=True)
        tvars2 = jax.device_put(
            {"params": tvars2["params"],
             "batch_stats": tvars2.get("batch_stats", {})}, dev)

        def os8(x):
            for _ in range(3):
                x = (x - 1) // 2 + 1
            return x

        fh, fw = os8(h), os8(w)
        tokens = (-(-fh // 3)) * (-(-fw // 3))

        # ONE jitted program: scan over 4-frame blocks, the pos_id rotation
        # statically unrolled inside the block (pos_id = frame % 4 is
        # deterministic) — a per-frame jit dispatch through the axon tunnel
        # costs ~25 ms RPC each and measures the tunnel, not the chip
        def td_block(st, frame4):
            tot = jnp.float32(0)
            for p in range(4):
                out, st = tmodel.apply(tvars2, frame4[p], pos_id=p,
                                       state=st)
                tot += jnp.sum(out[:, ::31, ::31].astype(jnp.float32))
            return st, tot

        @jax.jit
        def run_td(blocks, st):
            _, sums = jax.lax.scan(td_block, st, blocks)
            return jnp.sum(sums)

        st0 = init_td4_state(batch=1, tokens=tokens)
        blocks = frames.reshape(N // 4, 4, *frames.shape[1:])
        float(run_td(blocks, st0))
        times = []
        # 5 trials, not 3: BENCH_r04_dev1 recorded a 20.6% cross-trial
        # spread on this row (the shortest on-device program here, so
        # tunnel jitter weighs most); extra trials tighten min-of-N
        for _trial in range(5):
            start = time.perf_counter()
            float(run_td(blocks, st0))
            times.append(time.perf_counter() - start)
        best = min(times)
        SPREADS["tdnet"] = round(100.0 * (max(times) / best - 1.0), 1)
        tdnet_fps = N / best
        fl = _flops_of(jax.jit(td_block).lower(st0, blocks[0]).compile())
        tdnet_mfu = fl * (N // 4) / best / peak if fl else None
        st04 = init_td4_state(batch=B4, tokens=tokens)
        frames4 = make_frames4()
        blocks4 = frames4.reshape(N // 4, 4, *frames4.shape[1:])
        float(run_td(blocks4, st04))
        best4 = float("inf")
        for _trial in range(3):
            start = time.perf_counter()
            float(run_td(blocks4, st04))
            best4 = min(best4, time.perf_counter() - start)
        tdnet4_fps = N * B4 / best4
        del frames4, blocks4

        # bucketed masked streaming at PRODUCTION scan scale (the
        # full N=64 stack, not a verification-sized slice)
        from cvpr2021_vspw_implement_tpu.ops.masked import bucket_hw
        hp, wp = bucket_hw(h, w)
        fhp, fwp = os8(hp), os8(wp)
        tokens_p = (-(-fhp // 3)) * (-(-fwp // 3))
        frames_p = jnp.pad(frames, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w), (0, 0)))

        @jax.jit
        def run_td_bk(blocks, st, hv, wv):
            # same reduction as the exact row above (raw masked logits, no
            # prediction resize) so the delta isolates the masking cost
            def block(st, frame4):
                tot = jnp.float32(0)
                for p in range(4):
                    out, st = tmodel.apply(tvars2, frame4[p], pos_id=p,
                                           state=st, valid_hw=(hv, wv))
                    tot += jnp.sum(out[:, ::31, ::31].astype(jnp.float32))
                return st, tot

            _, sums = jax.lax.scan(block, st, blocks)
            return jnp.sum(sums)

        st0p = init_td4_state(batch=1, tokens=tokens_p)
        blocks_p = frames_p.reshape(N // 4, 4, *frames_p.shape[1:])
        hv, wv = jnp.int32(h), jnp.int32(w)
        float(run_td_bk(blocks_p, st0p, hv, wv))
        times = []
        for _trial in range(3):
            start = time.perf_counter()
            float(run_td_bk(blocks_p, st0p, hv, wv))
            times.append(time.perf_counter() - start)
        tdnet_bk_fps = round(N / min(times), 3)
        del frames_p, blocks_p
    except Exception as e:  # recorded, not swallowed
        ERRORS["tdnet"] = repr(e)[:160]

    # ------- 7. ETC window inference (eval = per-window forward) -----------
    etc_fps = etc_mfu = None
    try:
        from cvpr2021_vspw_implement_tpu.models.etc import ETC
        eenc = ModelBuilder.build_encoder("resnet101dilated",
                                          dtype=jnp.bfloat16)
        emodel = ETC(encoder=eenc, num_class=124, fc_dim=2048,
                     dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            evars = emodel.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                jnp.zeros((2, 1, 64, 64, 3), jnp.float32),
                                train=False)
        evars = jax.device_put(
            {"params": evars["params"],
             "batch_stats": evars.get("batch_stats", {})}, dev)

        def etc_step(_, win):
            outs = emodel.apply(evars, win, train=False)
            pred = inference_pred(outs, (h, w))
            return 0, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))

        wins = jnp.asarray(rng.standard_normal(
            (M, 2, 1, h, w, 3)).astype(np.float32))
        etc_fps, dt = timed_stream(etc_step, 0, wins, M)
        fl = _flops_of(jax.jit(etc_step).lower(0, wins[0]).compile())
        etc_mfu = fl * M / dt / peak if fl else None
    except Exception as e:  # recorded, not swallowed
        ERRORS["etc"] = repr(e)[:160]

    # ------- 7b. ETC width-bucketed window inference (production path) -----
    etc_bk_fps = None
    try:
        from cvpr2021_vspw_implement_tpu.models.segmentation import (
            inference_pred_rt)
        from cvpr2021_vspw_implement_tpu.ops.masked import (bucket_hw,
                                                            feature_valid)
        hp, wp = bucket_hw(h, w)
        winsp = jnp.pad(wins, ((0, 0), (0, 0), (0, 0), (0, hp - h),
                               (0, wp - w), (0, 0)))

        @jax.jit
        def etc_bk(winsp, hv, wv):
            def step(_, win):
                outs = emodel.apply(evars, win, train=False,
                                    valid_hw=(hv, wv))
                logit = outs[0]
                fv = feature_valid(logit.shape[1], logit.shape[2],
                                   (hv, wv), (hp, wp))
                pred = inference_pred_rt(outs, (hp, wp), fv, (hv, wv))
                return 0, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))
            _, sums = jax.lax.scan(step, 0, winsp)
            return jnp.sum(sums)

        hv, wv = jnp.int32(h), jnp.int32(w)
        float(etc_bk(winsp, hv, wv))
        times = []
        for _trial in range(3):
            t0 = time.perf_counter()
            float(etc_bk(winsp, hv, wv))
            times.append(time.perf_counter() - t0)
        etc_bk_fps = round(M / min(times), 3)
        del winsp, wins, evars
    except Exception as e:  # recorded, not swallowed
        ERRORS["etc_bucketed"] = repr(e)[:160]

    # ------- 7c. NetWarp streaming inference (production serving path) -----
    # per-frame work of serving.NetWarpStreamer: encode the target once,
    # run the frozen 20-iter RAFT + FlowCNN + warped blends against the
    # cached previous-frame features, decode (predictions identical to the
    # reference window path — tests/test_golden_eval.py)
    nw_fps = nw_mfu = nw_bk_fps = None
    try:
        from cvpr2021_vspw_implement_tpu.models.netwarp import NetWarp
        nwenc = ModelBuilder.build_encoder("resnet101dilated",
                                           dtype=jnp.bfloat16)
        nwmodel = NetWarp(encoder=nwenc, num_class=124, fc_dim=2048,
                          raft_iters=20, dtype=jnp.bfloat16)
        with jax.default_device(jax.devices("cpu")[0]):
            nwvars = nwmodel.init({"params": jax.random.PRNGKey(0),
                                   "dropout": jax.random.PRNGKey(1)},
                                  jnp.zeros((2, 1, 64, 64, 3), jnp.float32),
                                  train=False)
        nwvars = jax.device_put(
            {"params": nwvars["params"],
             "batch_stats": nwvars.get("batch_stats", {})}, dev)

        def nw_step(carry, img):
            c5_p, feats_p, prev = carry
            c5_t, feats_t = nwmodel.apply(nwvars, img, train=False,
                                          method=nwmodel.encode_frame)
            pred_logits, _ = nwmodel.apply(nwvars, img, prev, c5_t, c5_p,
                                           feats_p, train=False,
                                           method=nwmodel.fuse_pair)
            pred = inference_pred((pred_logits,), (h, w))
            return (c5_t, feats_t, img), jnp.sum(
                pred[0, ::97, ::97].astype(jnp.int32))

        nwframes = jnp.asarray(rng.standard_normal(
            (32, 1, h, w, 3)).astype(np.float32))
        carry0 = jax.tree_util.tree_map(
            lambda x: x, nwmodel.apply(nwvars, nwframes[0], train=False,
                                       method=nwmodel.encode_frame))
        carry0 = (carry0[0], carry0[1], nwframes[0])
        nw_fps, dt = timed_stream(nw_step, carry0, nwframes, 32,
                                  row="netwarp_stream")
        fl = _flops_of(jax.jit(nw_step).lower(carry0, nwframes[0])
                       .compile())
        nw_mfu = fl * 32 / dt / peak if fl else None

        # bucketed variant: masked encode + the bucket-grid RAFT fuse
        from cvpr2021_vspw_implement_tpu.serving import NetWarpBucketEngine
        nweng = NetWarpBucketEngine(nwmodel, nwvars, bucket=64)
        nwf_np = np.asarray(nwframes)
        c5_p, feats_p = nweng.encode(nwf_np[0, 0])
        nweng.fuse(nwf_np[1, 0], nwf_np[0, 0], c5_p, c5_p, feats_p)  # warm
        times = []
        for _trial in range(3):
            t0 = time.perf_counter()
            prev = nwf_np[0, 0]
            c5_p, feats_p = nweng.encode(prev)
            for i in range(1, 17):
                c5_t, feats_t = nweng.encode(nwf_np[i, 0])
                nweng.fuse(nwf_np[i, 0], prev, c5_t, c5_p, feats_p)
                prev, c5_p, feats_p = nwf_np[i, 0], c5_t, feats_t
            times.append((time.perf_counter() - t0) / 16)
        nw_bk_fps = round(1.0 / min(times), 3)
        del nwframes, nwvars, nwf_np
    except Exception as e:  # recorded, not swallowed
        ERRORS["netwarp_stream"] = repr(e)[:160]

    # ------- 7d. warp-family + nonlocal3d window inference ------------------
    # one row per remaining --method eval surface (train_clip2.py:469):
    # jitted window forward + argmax, scan over distinct windows
    method_rows = {}
    try:
        from cvpr2021_vspw_implement_tpu.models.nonlocal3d import NonLocal3D
        from cvpr2021_vspw_implement_tpu.models.propnet import PropNet
        from cvpr2021_vspw_implement_tpu.models.warp_our import ClipWarpNet
        from cvpr2021_vspw_implement_tpu.models.warp_our_merge import (
            OurWarpMerge)
        from cvpr2021_vspw_implement_tpu.models.segmentation import (
            inference_probs)
        WM = 8
        for name, cls, t1 in (("our_warp", ClipWarpNet, 4),
                              ("propnet", PropNet, 4),
                              ("our_warp_merge", OurWarpMerge, 4),
                              ("nonlocal3d", NonLocal3D, 3)):
            try:
                wenc = ModelBuilder.build_encoder("resnet101dilated",
                                                  dtype=jnp.bfloat16)
                wm = cls(encoder=wenc, num_class=124, fc_dim=2048,
                         dtype=jnp.bfloat16)
                with jax.default_device(jax.devices("cpu")[0]):
                    wvars = wm.init(
                        {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        jnp.zeros((t1, 1, 64, 64, 3), jnp.float32),
                        train=False)
                wvars = jax.device_put(
                    {"params": wvars["params"],
                     "batch_stats": wvars.get("batch_stats", {})}, dev)

                if name == "nonlocal3d":
                    def wstep(_, win, _wm=wm, _wv=wvars):
                        outs = _wm.apply(_wv, win, train=False)
                        # test_all averages per-frame probabilities
                        probs = inference_probs((outs[-1],), (h, w))
                        return 0, jnp.sum(
                            probs[0, ::97, ::97, 0].astype(jnp.float32))
                else:
                    def wstep(_, win, _wm=wm, _wv=wvars):
                        outs = _wm.apply(_wv, win, train=False)
                        pred = inference_pred(outs, (h, w))
                        return 0, jnp.sum(
                            pred[0, ::97, ::97].astype(jnp.int32))

                wwins = jnp.asarray(rng.standard_normal(
                    (WM, t1, 1, h, w, 3)).astype(np.float32))
                fps, dt = timed_stream(wstep, 0, wwins, WM, row=name)
                fl = _flops_of(jax.jit(wstep).lower(0, wwins[0]).compile())
                method_rows[name + "_windows_per_sec"] = round(fps, 3)
                method_rows[name + "_mfu"] = (
                    round(fl * WM / dt / peak, 4) if fl else None)
                del wwins, wvars
            except Exception as e:  # per-row guard
                ERRORS[name] = repr(e)[:160]
    except Exception as e:  # recorded, not swallowed
        ERRORS["window_methods"] = repr(e)[:160]

    # ------- 8. OCR-head microbench (reference's own harness shape:
    # models/ocr_modules/spatial_ocr_block.py:470-517 — conv3x3 2048→512 +
    # SpatialGather + SpatialOCR at 128x128, batch 1) ----------------------
    ocr_head_ms = None
    try:
        from cvpr2021_vspw_implement_tpu.models.ocr import (SpatialOCR,
                                                            spatial_gather)
        from flax import linen as nn_

        class _OcrMicro(nn_.Module):
            @nn_.compact
            def __call__(self, feats, probs):
                x = nn_.Conv(512, (3, 3), padding=1,
                             dtype=jnp.bfloat16)(feats)
                ctx = spatial_gather(x, probs)
                return SpatialOCR(512, 256, 512, dropout=0.0,
                                  dtype=jnp.bfloat16)(x, ctx, False)

        feats = jnp.asarray(rng.standard_normal(
            (1, 128, 128, 2048)).astype(np.float32), jnp.bfloat16)
        probs = jnp.asarray(rng.standard_normal(
            (1, 128, 128, 19)).astype(np.float32), jnp.bfloat16)
        om = _OcrMicro()
        omv = om.init(jax.random.PRNGKey(0), feats, probs)

        @jax.jit
        def ocr_micro(feats, probs):
            return jnp.sum(om.apply(omv, feats, probs)
                           .astype(jnp.float32))

        float(ocr_micro(feats, probs))
        best = float("inf")
        for _trial in range(100):
            start = time.perf_counter()
            float(ocr_micro(feats, probs))
            best = min(best, time.perf_counter() - start)
        ocr_head_ms = round(best * 1e3, 3)
    except Exception as e:  # recorded, not swallowed
        ERRORS["ocr_head"] = repr(e)[:160]

    # ------- 9. host input pipeline (decode+normalize at 480p) -------------
    # the chip-side rows above assume frames are already decoded; a real
    # VSPW eval's wall clock is min(chip rate, host rate).  Measured here
    # on THIS host (tools/host_pipeline_bench.py has the full sweep).
    host_fps = host_cores_needed = None
    try:
        import os as _os
        import sys as _sys
        _sys.path.insert(0, _os.path.join(_os.path.dirname(
            _os.path.abspath(__file__)), "tools"))
        from host_pipeline_bench import make_jpegs
        from cvpr2021_vspw_implement_tpu import native
        if native.jpeg_available():
            paths = make_jpegs(32)
            native.decode_jpeg_batch(paths[:4])  # warm the pool
            best = best1 = float("inf")
            for _trial in range(3):
                t0 = time.perf_counter()
                res = native.decode_jpeg_batch(paths)
                for a in res:
                    native.normalize_u8(a)
                best = min(best, time.perf_counter() - t0)
                # single-thread rate: the per-core extrapolation basis
                t0 = time.perf_counter()
                res = native.decode_jpeg_batch(paths, nthreads=1)
                for a in res:
                    native.normalize_u8(a)
                best1 = min(best1, time.perf_counter() - t0)
            host_fps = round(len(paths) / best, 1)
            host_fps1 = len(paths) / best1
            host_cores_needed = int(-(-stream_fps // host_fps1)) \
                if host_fps1 else None
            for p in paths:
                _os.unlink(p)
            _os.rmdir(_os.path.dirname(paths[0]))
    except Exception as e:  # recorded, not swallowed
        ERRORS["host_pipeline"] = repr(e)[:160]

    rnd = lambda x, n=4: (round(x, n) if isinstance(x, float) else x)
    out = {
        "metric": "tcb_psp_r101_480p_streaming_inference",
        "value": round(stream_fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(stream_fps / base_fps, 3) if base_fps else None,
        "mfu": rnd(stream_mfu),
        "tflops_per_sec": rnd(stream_flops / stream_dt / 1e12
                              if stream_flops else None, 2),
        "stream4_frames_per_sec": stream4_fps,
        # opt-in quantized serving (--serve_dtype int8, ops/quant.py):
        # NOT bit-identical to bf16 — an accuracy/throughput trade
        "int8_stream_frames_per_sec": int8_fps,
        "int8_speedup": (round(int8_fps / stream_fps, 3)
                         if int8_fps else None),
        # production (width-bucketed masked) eval-path rows: 480x853 padded
        # to the 512x896 bucket, true size as runtime scalars; the pct is
        # the overhead vs the exact-shape kernel above
        "stream_bucketed_frames_per_sec": stream_bk_fps,
        "stream_bucketed_overhead_pct": (
            round(100.0 * (stream_fps / stream_bk_fps - 1.0), 1)
            if stream_bk_fps else None),
        "baseline_frames_per_sec": round(base_fps, 3),
        "baseline_mfu": rnd(base_mfu),
        "baseline_def": "reference window formulation (test_clip2.py:28-89),"
                        " same model/chip/dtype, measured",
        "train_step_ms": round(train_dt * 1e3, 2),
        "train_mfu": rnd(train_mfu),
        "train_step_single_readback_ms": round(train_single_dt * 1e3, 2),
        "train_shape": "T+1=4 x B=2 x 479x479 (run_temporal_psp.sh/chip), "
                       "8 donated back-to-back steps / 1 readback",
        "train_b4_ms_per_2_samples": train_b4_ms_per2,
        "netwarp_train_step_ms": netwarp_ms,
        # per-method serving matrix (all on the same chip, bf16, 480x853)
        "clipocr_frames_per_sec": rnd(clipocr_fps, 3),
        "clipocr_mfu": rnd(clipocr_mfu),
        "clipocr_stream4_frames_per_sec": rnd(clipocr4_fps, 3),
        "clipocr_bucketed_frames_per_sec": clipocr_bk_fps,
        "clipocr_bucketed_overhead_pct": (
            round(100.0 * (clipocr_fps / clipocr_bk_fps - 1.0), 1)
            if clipocr_bk_fps and clipocr_fps else None),
        "tdnet_frames_per_sec": rnd(tdnet_fps, 3),
        "tdnet_mfu": rnd(tdnet_mfu),
        "tdnet_stream4_frames_per_sec": rnd(tdnet4_fps, 3),
        "tdnet_bucketed_frames_per_sec": tdnet_bk_fps,
        "tdnet_bucketed_overhead_pct": (
            round(100.0 * (tdnet_fps / tdnet_bk_fps - 1.0), 1)
            if tdnet_bk_fps and tdnet_fps else None),
        "etc_windows_per_sec": rnd(etc_fps, 3),
        "etc_mfu": rnd(etc_mfu),
        "etc_bucketed_windows_per_sec": etc_bk_fps,
        "etc_train_step_ms": etc_train_ms,
        "etc_train_mfu": rnd(etc_train_mfu),
        "netwarp_train_mfu": rnd(netwarp_train_mfu),
        # NetWarp production streaming inference (serving.NetWarpStreamer
        # per-frame work: encode target + 20-iter RAFT fuse vs cached prev)
        "netwarp_stream_frames_per_sec": rnd(nw_fps, 3),
        "netwarp_stream_mfu": rnd(nw_mfu),
        "netwarp_stream_bucketed_frames_per_sec": nw_bk_fps,
        # eval-shape policy on the width mix (704+853): steady-state
        # effective f/s; 'auto' routes both common shapes to exact kernels,
        # so its effective rate is the exact row (compile amortization
        # measured in tools/eval_policy_micro.py)
        "eval_policy_exact_mix_fps": policy_exact_mix_fps,
        "eval_policy_bucketed_mix_fps": policy_bucketed_mix_fps,
        # remaining --method eval surfaces (train_clip2.py:469)
        **method_rows,
        "ocr_head_ms": ocr_head_ms,
        # host-side decode+normalize rate on THIS machine's cores (the
        # eval wall clock is min(chip rate, host rate) — cores_needed =
        # per-core-extrapolated cores to saturate one chip's streaming)
        "host_decode_frames_per_sec": host_fps,
        "host_cores_to_saturate_chip": host_cores_needed,
        # cross-trial wall-time spread per serving row (worst/best - 1, %):
        # a large value flags the run as unstable (round-3's ClipOCR
        # contradiction motivated this guard)
        "spreads_pct": SPREADS or None,
        "errors": ERRORS or None,
        "device": getattr(dev, "device_kind", str(dev)),
        "peak_tflops_bf16": peak / 1e12,
    }

    # ---- cross-RUN drift guard (VERDICT r4 #7): within-run spreads catch
    # trial noise, not run-to-run regime shifts (the r3 ClipOCR lesson).
    # Compare every throughput/latency row against the newest archived
    # bench_runs artifact and record the drift; tools/gen_readme_table.py
    # refuses to regenerate README from an artifact whose drift exceeds
    # its recorded spread (+2% floor). ----
    prev, prev_name = _load_prev_artifact()
    if prev:
        drift = {}
        for k, v in out.items():
            if not (k == "value" or k.endswith("_per_sec")
                    or k.endswith("_ms")):
                continue
            pv = prev.get(k)
            if isinstance(v, (int, float)) and isinstance(pv, (int, float)) \
                    and pv:
                drift[k] = round(100.0 * (v / pv - 1.0), 1)
        out["drift_vs_prev_pct"] = drift or None
        out["drift_prev_artifact"] = prev_name
    _archive_run(out)
    print(json.dumps(out))


def _load_prev_artifact(d="bench_runs"):
    """Newest archived full-bench artifact (by mtime) or (None, None)."""
    import glob
    import os as _os
    best, best_m = None, -1.0
    for p in glob.glob(_os.path.join(_os.path.dirname(
            _os.path.abspath(__file__)), d, "*.json")):
        try:
            with open(p) as f:
                obj = json.load(f)
        except Exception:
            continue
        if obj.get("metric") != "tcb_psp_r101_480p_streaming_inference":
            continue
        m = _os.path.getmtime(p)
        if m > best_m:
            best, best_m = (obj, _os.path.basename(p)), m
    return best if best else (None, None)


def _archive_run(out, d="bench_runs"):
    """Store this run so the next one can measure drift against it."""
    import os as _os
    root = _os.path.dirname(_os.path.abspath(__file__))
    _os.makedirs(_os.path.join(root, d), exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    with open(_os.path.join(root, d, f"run_{stamp}.json"), "w") as f:
        json.dump(out, f, indent=1)


def _main_with_tunnel_retry(attempts=3):
    """The axon tunnel's remote_compile endpoint occasionally drops the
    HTTP response mid-compile ("response body closed before all bytes
    were read"), killing an otherwise-healthy run.  Since the persistent
    compile cache (/root/repo/.jax_cache) makes every already-compiled
    program free on a rerun, the cheapest robust recovery is to retry
    the whole bench on a transport error."""
    for attempt in range(attempts):
        try:
            return main()
        except Exception as e:  # noqa: BLE001 — inspect and re-raise below
            msg = repr(e)
            transient = any(s in msg for s in (
                "remote_compile", "read body", "response body closed",
                "Connection reset", "EOF occurred"))
            if not transient or attempt == attempts - 1:
                raise
            ERRORS.clear()
            print(f"# transient tunnel error (attempt {attempt + 1}/"
                  f"{attempts}), retrying: {msg[:120]}", flush=True)
            time.sleep(20)


if __name__ == "__main__":
    _main_with_tunnel_retry()
