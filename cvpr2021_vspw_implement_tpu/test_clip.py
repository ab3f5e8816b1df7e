"""Temporal-method evaluation driver (reference: test_clip2.py).

Per-video loop over the clip eval datasets, computing global / per-video
mIoU, in-loop VC (video consistency) and optional palette PNG dumps.
Supports the clip_ocr streaming memory (cleaned at each video start —
reference ``is_clean_memory``, test_clip2.py:44-48).

TPU-native serving note: TCB-PSP/TCB-OCR take the streaming fast path
(serving.py — every frame encoded once, bit-identical to the window
formulation); other methods encode their window per frame like the
reference, with the jitted step cached per (T, H, W) shape.
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .config import cfg as default_cfg
from .data import TestClipDataset, TestLongClipDataset, list_videos
from .methods import LONGCLIP_METHODS, build_method
from .models.segmentation import inference_pred
from .utils import Evaluator, get_common, setup_logger, vspw_palette


def build_eval_clip_parser():
    p = argparse.ArgumentParser(description="TPU Video Segmentation Eval")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--dataroot", type=str, default="")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--num_class", type=int, default=124)
    p.add_argument("--method", type=str, default="clip_psp")
    p.add_argument("--load", type=str, default="")
    p.add_argument("--torch_load", type=str, default="",
                   help="reference fused clip model .pth (clip_psp only)")
    p.add_argument("--saveroot", type=str, default="")
    p.add_argument("--is_save", action="store_true")
    p.add_argument("--lesslabel", action="store_true")
    p.add_argument("--clip_num", type=int, default=4)
    p.add_argument("--dilation_num", type=int, default=0)
    p.add_argument("--dilation2", type=str, default="3,6,9")
    p.add_argument("--vc_clip_num", type=int, default=8)
    p.add_argument("--use_memory", type=lambda s: s.lower() in ("1", "true"),
                   default=False)
    p.add_argument("--memory_num", type=int, default=8)
    p.add_argument("--clipocr_all", type=lambda s: s.lower() in ("1", "true"),
                   default=False)
    p.add_argument("--psp_weight", type=lambda s: s.lower() in ("1", "true"),
                   default=False)
    p.add_argument("--deepsup_scale", type=float, default=0.4)
    p.add_argument("--st_weight", type=float, default=0.1)
    p.add_argument("--allsup", type=lambda s: s.lower() in ("1", "true"),
                   default=False)
    p.add_argument("--allsup_scale", type=float, default=0.3)
    p.add_argument("--linear_combine", type=lambda s: s.lower() in ("1", "true"),
                   default=False)
    p.add_argument("--distsoftmax", type=lambda s: s.lower() in ("1", "true"),
                   default=False)
    p.add_argument("--distnearest", type=lambda s: s.lower() in ("1", "true"),
                   default=False)
    p.add_argument("--temp", type=float, default=3)
    p.add_argument("--max_distances", type=str, default="10")
    p.add_argument("--max_videos", type=int, default=0)
    p.add_argument("--width_bucket", type=int, default=64,
                   help="pad eval frame WIDTHS to multiples of this (heights round to the stride, 32) and reuse "
                        "one compiled kernel per bucket across videos "
                        "(ops/masked.py; 0 = compile per distinct shape); "
                        "predictions are pixel-identical for the conv/pool "
                        "heads and match to float precision for the "
                        "flow-coupled methods (masked instance-norm "
                        "statistics reduce in a different order)")
    p.add_argument("--eval_policy", choices=("bucketed", "exact", "auto"),
                   default="bucketed",
                   help="eval-shape policy for the streaming methods "
                        "(clip_psp/clip_ocr): 'bucketed' shares one masked "
                        "kernel per width bucket (--width_bucket) at a "
                        "measured per-frame tax; 'exact' compiles one "
                        "exact-shape kernel per distinct video shape "
                        "(cached across videos and, via the persistent "
                        "compile cache, across runs); 'auto' census-counts "
                        "frames per shape over the val list and compiles "
                        "exact only where >= --exact_min_frames amortize "
                        "the compile (tools/eval_policy_micro.py)")
    p.add_argument("--exact_min_frames", type=int, default=15000,
                   help="auto policy: total frames a shape needs across "
                        "the val list before an exact kernel beats the "
                        "bucketed one.  Measured default (v5e, R101 "
                        "ClipPSP, tools/eval_policy_micro.py): warm-cache "
                        "compile 7-34 s/width over a 1.0-2.4 ms/frame "
                        "bucket tax -> break-even 6k-25k frames/shape; "
                        "lower it on a second run over the same val list "
                        "(the persistent cache then makes exact strictly "
                        "better past ~1k frames)")
    p.add_argument("--serve_dtype", choices=("bf16", "int8"),
                   default="bf16",
                   help="'int8' quantizes the wide spatial convs for "
                        "serving (dynamic per-tensor activations, "
                        "per-channel weights; ops/quant.py) — measured "
                        "1.17x on the flagship streaming step with 97%% "
                        "argmax agreement at random-weight (worst-case) "
                        "margins (tools/int8_trunk_micro.py).  An "
                        "accuracy/throughput TRADE, never a default")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p


def _test_all_nonlocal3d(args, video, infer, evaluator, palette, logger,
                         is_save):
    """Score averaging across overlapping windows for nonlocal3d
    (reference ``test_all``: test_clip2.py:90-195): every frame's softmax
    scores accumulate over the ``clip_num`` windows containing it; the
    averaged scores are argmaxed once the frame has been seen clip_num
    times (leftovers flushed at video end)."""
    import jax.numpy as jnp

    ds = TestClipDataset(args.dataroot, video, args)
    eval_video = Evaluator(args.num_class)
    gt_dic, pred_dic, done = {}, {}, set()
    gt_list, pred_list = {}, {}

    def flush(nn):
        probs = np.mean(pred_dic.pop(nn), axis=0)
        pred = np.argmax(probs, axis=-1)
        gt = gt_dic[nn]
        evaluator.add_batch(gt[None], pred[None])
        eval_video.add_batch(gt[None], pred[None])
        gt_list[nn], pred_list[nn] = gt, pred
        done.add(nn)
        if is_save and args.saveroot:
            odir = os.path.join(args.saveroot, video)
            os.makedirs(odir, exist_ok=True)
            out = Image.fromarray(pred.astype(np.uint8), mode="P")
            out.putpalette(palette)
            out.save(os.path.join(odir, os.path.splitext(nn)[0] + ".png"))

    for i in range(len(ds)):
        _img, _gt, clips, cliplabs, _gtname, names = ds[i]
        imgs = jnp.asarray(np.stack(clips)[:, None])
        probs = np.asarray(infer(imgs))                  # [T,1,H,W,K]
        for t, nn in enumerate(names):
            if nn in done:
                continue
            gt_dic.setdefault(nn, cliplabs[t])
            pred_dic.setdefault(nn, []).append(probs[t, 0])
            if len(pred_dic[nn]) > args.clip_num - 1:
                flush(nn)
    for nn in list(pred_dic):
        flush(nn)

    order = sorted(gt_list)
    gts = [gt_list[n] for n in order]
    preds = [pred_list[n] for n in order]
    h, w = gts[0].shape
    vc = get_common(gts, preds, args.vc_clip_num, h, w)
    vm = eval_video.Mean_Intersection_over_Union()
    logger.info(f"video {video}: mIoU {vm:.4f} (test_all)")
    return vc, vm


def evaluate_clip(cfg, args, variables=None, logger=None,
                  max_videos: int = 0, is_save: bool = False):
    if getattr(args, "serve_dtype", "bf16") == "int8":
        # opt-in quantized serving: every jitted step traced inside this
        # context runs its wide spatial convs as s8xs8->s32 (ops/quant.py;
        # measured 1.17x end-to-end on the flagship streaming step,
        # tools/int8_trunk_micro.py) — predictions are NOT bit-identical
        from .ops.quant import int8_trunk
        with int8_trunk():
            return _evaluate_clip(cfg, args, variables, logger,
                                  max_videos, is_save)
    return _evaluate_clip(cfg, args, variables, logger, max_videos, is_save)


def _evaluate_clip(cfg, args, variables=None, logger=None,
                   max_videos: int = 0, is_save: bool = False):
    logger = logger or setup_logger()
    dtype = jnp.bfloat16 if cfg.TPU.compute_dtype == "bfloat16" else None
    # eval always runs the standard (unpipelined) layout: checkpoints from a
    # GPipe-pipelined trainer are maybe_unpipeline()d below, so the model
    # must be built with pipeline_stages=0 or apply() would expect stacked
    # layer3_pipe/stages params that no longer exist.
    if getattr(cfg.TPU, "pipeline_stages", 0) > 1:
        cfg = cfg.clone()
        cfg.TPU.pipeline_stages = 0
    model, _ = build_method(args.method, cfg, args, dtype)

    use_memory = getattr(args, "use_memory", False) and args.method == "clip_ocr"

    if variables is None:
        key = jax.random.PRNGKey(0)
        sample = jnp.zeros((args.clip_num, 1, 64, 64, 3), jnp.float32)
        if args.method == "hrnetv2_clip":
            # SegmentationModuleClip takes (target, clips) (hrnet_clip.py)
            variables = model.init({"params": key, "dropout": key},
                                   sample[-1], sample[:-1], train=True)
        else:
            variables = model.init({"params": key, "dropout": key}, sample,
                                   train=True)
        variables = {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})}
        if args.load:
            # the reference's --load points at a fused TORCH checkpoint
            # (test_clip2.py:28-45); ours is a TrainState .msgpack.  Accept
            # both: on msgpack parse failure, fall through to the fused
            # torch importer path.
            import flax.serialization as ser
            try:
                with open(args.load, "rb") as f:
                    tree = ser.msgpack_restore(f.read())
                variables = {"params": tree["params"],
                             "batch_stats": tree["batch_stats"]}
                logger.info(f"loaded checkpoint {args.load}")
            except Exception:
                args.torch_load = args.torch_load or args.load
                logger.info(f"--load {args.load} is not a msgpack "
                            "checkpoint; treating as a fused torch .pth")
        if getattr(args, "torch_load", ""):
            # fused reference clip checkpoint (train_clip2.py:179-189)
            import torch as _torch
            from .models.import_torch import (FUSED_IMPORTERS,
                                              merge_variables)
            assert args.method in FUSED_IMPORTERS, (
                f"--torch_load supports {sorted(FUSED_IMPORTERS)} "
                "fused checkpoints")
            sd = _torch.load(args.torch_load, map_location="cpu")
            variables = merge_variables(
                dict(variables), FUSED_IMPORTERS[args.method](sd))
            logger.info(f"imported fused torch checkpoint {args.torch_load}")

    # checkpoints written by a GPipe-pipelined trainer store the trunk's
    # tail blocks stacked; eval runs the standard layout (exact conversion)
    from .models.pipeline import maybe_unpipeline
    variables = maybe_unpipeline(variables)

    if use_memory:
        @jax.jit
        def infer(imgs, memory):
            (outs,), new_mem = model.apply(variables, imgs, train=False,
                                           memory=memory)
            return inference_pred((outs,), imgs.shape[2:4]), new_mem
    elif args.method == "nonlocal3d":
        from .models.segmentation import inference_probs

        @jax.jit
        def infer(imgs):
            outs = model.apply(variables, imgs, train=False)  # [T,B,h,w,K]
            return jnp.stack([inference_probs((outs[t],), imgs.shape[2:4])
                              for t in range(imgs.shape[0])])
    elif args.method == "hrnetv2_clip":
        # (target, clips) signature; the window loop stacks target LAST
        @jax.jit
        def infer(imgs):
            outs = model.apply(variables, imgs[-1], imgs[:-1], train=False)
            return inference_pred(outs, imgs.shape[2:4])
    else:
        @jax.jit
        def infer(imgs):
            outs = model.apply(variables, imgs, train=False)
            return inference_pred(outs, imgs.shape[2:4])

    #: window-path methods whose model __call__ accepts runtime-valid
    #: sizes — ALL of them (ops/masked.py); one compile per bucket,
    #: predictions match the unpadded run on the valid region.
    BUCKETED_WINDOW_METHODS = ("ETC", "etc_ocr", "clip_psp", "clip_ocr",
                               "our_warp", "propnet", "our_warp_merge",
                               "nonlocal3d", "hrnetv2_clip")
    if (getattr(args, "width_bucket", 0)
            and args.method in BUCKETED_WINDOW_METHODS):
        from .models.segmentation import (inference_pred_rt,
                                          inference_probs_rt)
        from .ops.masked import bucket_hw, feature_valid

        _bk = args.width_bucket

        def _pad(imgs, key):
            return jnp.pad(imgs, ((0, 0), (0, 0), (0, key[0] - imgs.shape[2]),
                                  (0, key[1] - imgs.shape[3]), (0, 0)))

        if use_memory:
            # clip_ocr streaming-memory window path: the ring buffer is
            # shape-independent, so it threads through unchanged
            @jax.jit
            def _infer_bucketed_mem(imgs, memory, hv, wv):
                (outs,), new_mem = model.apply(variables, imgs, train=False,
                                               memory=memory,
                                               valid_hw=(hv, wv))
                pad_hw = imgs.shape[2:4]
                fv = feature_valid(outs.shape[1], outs.shape[2], (hv, wv),
                                   pad_hw)
                return (inference_pred_rt((outs,), pad_hw, fv, (hv, wv)),
                        new_mem)

            def infer(imgs, memory):  # noqa: F811 — bucketed override
                t, b, h, w, _ = imgs.shape
                key = bucket_hw(h, w, _bk)
                pred, new_mem = _infer_bucketed_mem(
                    _pad(imgs, key), memory, jnp.int32(h), jnp.int32(w))
                return pred[:, :h, :w], new_mem
        elif args.method == "nonlocal3d":
            # test_all needs per-frame probabilities for window averaging
            @jax.jit
            def _infer_bucketed_probs(imgs, hv, wv):
                outs = model.apply(variables, imgs, train=False,
                                   valid_hw=(hv, wv))     # [T,B,h,w,K]
                pad_hw = imgs.shape[2:4]
                fv = feature_valid(outs.shape[2], outs.shape[3], (hv, wv),
                                   pad_hw)
                return jnp.stack([
                    inference_probs_rt((outs[t],), pad_hw, fv, (hv, wv))
                    for t in range(outs.shape[0])])

            def infer(imgs):  # noqa: F811 — bucketed override
                t, b, h, w, _ = imgs.shape
                key = bucket_hw(h, w, _bk)
                probs = _infer_bucketed_probs(_pad(imgs, key), jnp.int32(h),
                                              jnp.int32(w))
                return probs[:, :, :h, :w]
        elif args.method == "hrnetv2_clip":
            @jax.jit
            def _infer_bucketed_hrclip(imgs, hv, wv):
                outs = model.apply(variables, imgs[-1], imgs[:-1],
                                   train=False, valid_hw=(hv, wv))
                pad_hw = imgs.shape[2:4]
                logit = outs[0]
                fv = feature_valid(logit.shape[1], logit.shape[2], (hv, wv),
                                   pad_hw)
                return inference_pred_rt(outs, pad_hw, fv, (hv, wv))

            def infer(imgs):  # noqa: F811 — bucketed override
                t, b, h, w, _ = imgs.shape
                key = bucket_hw(h, w, _bk)
                pred = _infer_bucketed_hrclip(_pad(imgs, key), jnp.int32(h),
                                              jnp.int32(w))
                return pred[:, :h, :w]
        else:
            @jax.jit
            def _infer_bucketed(imgs, hv, wv):
                outs = model.apply(variables, imgs, train=False,
                                   valid_hw=(hv, wv))
                pad_hw = imgs.shape[2:4]
                logit = outs[0]
                fv = feature_valid(logit.shape[1], logit.shape[2], (hv, wv),
                                   pad_hw)
                return inference_pred_rt(outs, pad_hw, fv, (hv, wv))

            def infer(imgs):  # noqa: F811 — bucketed override
                t, b, h, w, _ = imgs.shape
                key = bucket_hw(h, w, _bk)
                pred = _infer_bucketed(_pad(imgs, key), jnp.int32(h),
                                       jnp.int32(w))
                return pred[:, :h, :w]

    ds_cls = TestLongClipDataset if args.method in LONGCLIP_METHODS \
        else TestClipDataset
    evaluator = Evaluator(args.num_class)
    vmiou, vc_accs = {}, []
    palette = vspw_palette()
    videos = list_videos(args.dataroot, args.split)
    if max_videos:
        videos = videos[:max_videos]

    # streaming fast path: TCB-PSP/TCB-OCR encode each frame once
    # (serving.py); predictions are identical to the window formulation
    stream_cls = None
    if getattr(args, "streaming", True):
        if args.method == "clip_psp":
            from .serving import ClipPSPStreamer as stream_cls
        elif (args.method == "clip_ocr" and not use_memory
              and not getattr(args, "clipocr_all", False)):
            from .serving import ClipOCRStreamer as stream_cls
        elif (args.method in ("netwarp", "netwarp_ocr")
              and args.dilation_num == 0):
            from .data import TestFrameDataset
            from .serving import NetWarpBucketEngine, NetWarpStreamer
            nw_engine = None
            if getattr(args, "width_bucket", 0):
                nw_engine = NetWarpBucketEngine(model, variables,
                                                bucket=args.width_bucket)
            for video in videos:
                ds = TestFrameDataset(args.dataroot, video, args)
                eval_video = Evaluator(args.num_class)
                items = [ds[i] for i in range(len(ds))]
                h0, w0 = items[0][0].shape[:2]
                streamer = NetWarpStreamer(model, variables, len(ds),
                                           (h0, w0), engine=nw_engine)
                gt_list = [it[1] for it in items]
                pred_list = [None] * len(ds)
                for i, pred in streamer.run([it[0] for it in items]):
                    pred_list[i] = pred
                    evaluator.add_batch(gt_list[i][None], pred[None])
                    eval_video.add_batch(gt_list[i][None], pred[None])
                    if is_save and args.saveroot:
                        odir = os.path.join(args.saveroot, video)
                        os.makedirs(odir, exist_ok=True)
                        out = Image.fromarray(pred.astype(np.uint8), mode="P")
                        out.putpalette(palette)
                        out.save(os.path.join(odir, items[i][2]))
                h, w = gt_list[0].shape
                vc_accs.extend(get_common(gt_list, pred_list,
                                          args.vc_clip_num, h, w))
                vmiou[video] = eval_video.Mean_Intersection_over_Union()
                logger.info(f"video {video}: mIoU {vmiou[video]:.4f} "
                            "(netwarp streaming)")
            videos = []
    if stream_cls is not None:
        from .data import TestFrameDataset
        dil = args.dilation2
        dilation2 = [int(d) for d in dil.split(",")] \
            if isinstance(dil, str) else list(dil)
        # eval-shape policy (VERDICT r4 #1): 'bucketed' shares one masked
        # kernel per width bucket; 'exact' compiles per distinct shape,
        # cached across videos/runs; 'auto' picks per shape by whether its
        # total frame count amortizes the compile over the bucket tax
        policy = getattr(args, "eval_policy", "bucketed")
        engine = None
        if policy != "exact" and getattr(args, "width_bucket", 0):
            if args.method == "clip_psp":
                from .serving import ClipPSPBucketEngine
                engine = ClipPSPBucketEngine(model, variables,
                                             bucket=args.width_bucket)
            elif args.method == "clip_ocr":
                from .serving import ClipOCRBucketEngine
                engine = ClipOCRBucketEngine(model, variables,
                                             bucket=args.width_bucket)
        exact_engine, census, vshapes = None, None, None
        if policy in ("exact", "auto"):
            from .serving import ExactShapeEngine, video_shape_census
            exact_engine = ExactShapeEngine(model, variables)
            if policy == "auto":
                census, vshapes = video_shape_census(args.dataroot, videos)
        for video in videos:
            ds = TestFrameDataset(args.dataroot, video, args)
            eval_video = Evaluator(args.num_class)
            items = [ds[i] for i in range(len(ds))]
            h0, w0 = items[0][0].shape[:2]
            eng_v = engine
            if policy == "exact" or (
                    policy == "auto"
                    and census.get(vshapes.get(video, (h0, w0)), 0)
                    >= getattr(args, "exact_min_frames", 15000)):
                eng_v = exact_engine
            streamer = stream_cls(model, variables, dilation2,
                                  len(ds), (h0, w0), engine=eng_v)
            gt_list = [it[1] for it in items]
            pred_list = [None] * len(ds)
            for i, pred in streamer.run(it[0] for it in items):
                pred_list[i] = pred
                evaluator.add_batch(gt_list[i][None], pred[None])
                eval_video.add_batch(gt_list[i][None], pred[None])
                if is_save and args.saveroot:
                    odir = os.path.join(args.saveroot, video)
                    os.makedirs(odir, exist_ok=True)
                    out = Image.fromarray(pred.astype(np.uint8), mode="P")
                    out.putpalette(palette)
                    out.save(os.path.join(odir, items[i][2]))
            h, w = gt_list[0].shape
            vc_accs.extend(get_common(gt_list, pred_list, args.vc_clip_num,
                                      h, w))
            vmiou[video] = eval_video.Mean_Intersection_over_Union()
            logger.info(f"video {video}: mIoU {vmiou[video]:.4f} (streaming)")
        videos = []

    if args.method == "tdnet":
        # streaming single-frame inference with the rotating path schedule
        # and 3-deep K/V/Q queues (reference: td4_psp.py:317-330 intent;
        # pos_id = frame index % 4 like the trainer's rotation)
        import functools
        from .data import TestFrameDataset
        from .models.td4_psp import init_td4_state

        @functools.partial(jax.jit, static_argnames=("pos_id",))
        def td4_step(img, state, pos_id):
            out, new_state = model.apply(variables, img, pos_id=pos_id,
                                         state=state)
            # td4's own upsample convention is align_corners=True
            # (reference td4_psp.py:19 up_kwargs), unlike every other
            # method's eval branch (align_corners=False)
            return inference_pred((out,), img.shape[1:3],
                                  align_corners=True), new_state

        @functools.partial(jax.jit, static_argnames=("pos_id",))
        def td4_step_bucketed(img, state, pos_id, hv, wv):
            # masked stream on the bucket grid (models/td4_psp.py): one
            # compile per (bucket, pos_id) shared across ALL videos
            from .models.segmentation import inference_pred_rt
            from .ops.masked import feature_valid
            out, new_state = model.apply(variables, img, pos_id=pos_id,
                                         state=state, valid_hw=(hv, wv))
            pad_hw = img.shape[1:3]
            fv = feature_valid(out.shape[1], out.shape[2], (hv, wv), pad_hw)
            return inference_pred_rt((out,), pad_hw, fv, (hv, wv),
                                     align_corners=True), new_state

        # eval-shape policy (VERDICT r4 #9): tdnet's bucket tax is the
        # worst of the serving rows (trunk mask passes on a thin,
        # bandwidth-bound resnet18 — tools/tdnet_bucket_micro.py), so
        # routing dominant shapes to exact kernels pays off soonest here.
        # td4's exact step IS the per-shape kernel (jit caches per shape,
        # persistent cache across runs), so 'exact'/'auto' simply drop
        # the bucket for amortizing shapes.
        policy = getattr(args, "eval_policy", "bucketed")
        census, vshapes = None, None
        if policy == "auto":
            from .serving import video_shape_census
            census, vshapes = video_shape_census(args.dataroot, videos)
        for video in videos:
            ds = TestFrameDataset(args.dataroot, video, args)
            eval_video = Evaluator(args.num_class)
            gt_list, pred_list = [], []
            img0, _, _ = ds[0]

            def os8(x):  # three stride-2 convs/pools with k3 p1
                for _ in range(3):
                    x = (x - 1) // 2 + 1
                return x

            h0, w0 = img0.shape[:2]
            bucket = getattr(args, "width_bucket", 0)
            if policy == "exact" or (
                    policy == "auto" and census is not None
                    and census.get(vshapes.get(video, (h0, w0)), 0)
                    >= getattr(args, "exact_min_frames", 15000)):
                bucket = 0
            if bucket:
                from .ops.masked import bucket_hw, pad_to
                key = bucket_hw(h0, w0, bucket)
                fh, fw = os8(key[0]), os8(key[1])
            else:
                fh, fw = os8(h0), os8(w0)
            tokens = (-(-fh // 3)) * (-(-fw // 3))
            state = init_td4_state(batch=1, tokens=tokens)
            for i in range(len(ds)):
                img, gt, gtname = ds[i]
                if bucket:
                    pred, state = td4_step_bucketed(
                        pad_to(jnp.asarray(img[None]), key), state, i % 4,
                        jnp.int32(h0), jnp.int32(w0))
                    pred = np.asarray(pred)[0, :h0, :w0]
                else:
                    pred, state = td4_step(jnp.asarray(img[None]), state,
                                           i % 4)
                    pred = np.asarray(pred)[0]
                evaluator.add_batch(gt[None], pred[None])
                eval_video.add_batch(gt[None], pred[None])
                gt_list.append(gt)
                pred_list.append(pred)
                if is_save and args.saveroot:
                    odir = os.path.join(args.saveroot, video)
                    os.makedirs(odir, exist_ok=True)
                    out = Image.fromarray(pred.astype(np.uint8), mode="P")
                    out.putpalette(palette)
                    out.save(os.path.join(odir, gtname))
            h, w = gt_list[0].shape
            vc_accs.extend(get_common(gt_list, pred_list, args.vc_clip_num,
                                      h, w))
            vmiou[video] = eval_video.Mean_Intersection_over_Union()
            logger.info(f"video {video}: mIoU {vmiou[video]:.4f} (tdnet stream)")
        videos = []

    for video in videos:
        if args.method == "nonlocal3d":
            ev = _test_all_nonlocal3d(args, video, infer, evaluator, palette,
                                      logger, is_save)
            vc_accs.extend(ev[0])
            vmiou[video] = ev[1]
            continue
        ds = ds_cls(args.dataroot, video, args)
        eval_video = Evaluator(args.num_class)
        gt_list, pred_list = [], []
        memory = None
        if use_memory:
            from .models.clip_ocr import init_memory
            memory = init_memory(args.memory_num, 1, args.num_class)
        for i in range(len(ds)):
            img, gt, clips, cliplabs, gtname = ds[i]
            frames = clips + [img]  # context..., target (encoder order)
            imgs = jnp.asarray(np.stack(frames)[:, None])  # [T, 1, H, W, 3]
            if use_memory:
                pred, memory = infer(imgs, memory)
            else:
                pred = infer(imgs)
            pred = np.asarray(pred)[0]
            evaluator.add_batch(gt[None], pred[None])
            eval_video.add_batch(gt[None], pred[None])
            gt_list.append(gt)
            pred_list.append(pred)
            if is_save and args.saveroot:
                odir = os.path.join(args.saveroot, video)
                os.makedirs(odir, exist_ok=True)
                out = Image.fromarray(pred.astype(np.uint8), mode="P")
                out.putpalette(palette)
                out.save(os.path.join(odir, gtname))
        h, w = gt_list[0].shape
        vc_accs.extend(get_common(gt_list, pred_list, args.vc_clip_num, h, w))
        vmiou[video] = eval_video.Mean_Intersection_over_Union()
        logger.info(f"video {video}: mIoU {vmiou[video]:.4f}")

    metrics = {
        "Acc": evaluator.Pixel_Accuracy(),
        "Acc_class": evaluator.Pixel_Accuracy_Class(),
        "mIoU": evaluator.Mean_Intersection_over_Union(),
        "fwIoU": evaluator.Frequency_Weighted_Intersection_over_Union(),
        "video_mIoU": float(np.nanmean(list(vmiou.values()))),
        "VC": float(np.nanmean(vc_accs)) if vc_accs else float("nan"),
    }
    logger.info(
        "Acc:{Acc:.4f}, Acc_class:{Acc_class:.4f}, mIoU:{mIoU:.4f}, "
        "fwIoU:{fwIoU:.4f}, video mIoU:{video_mIoU:.4f}, "
        "VC{vc}:{VC:.4f}".format(vc=args.vc_clip_num, **metrics))
    if args.saveroot:
        os.makedirs(args.saveroot, exist_ok=True)
        with open(os.path.join(args.saveroot, "vmiou.pkl"), "wb") as f:
            pickle.dump(vmiou, f)
    return metrics, vmiou


def main():
    from .utils.misc import honor_platform_env
    honor_platform_env()
    # persistent compile cache: exact-shape eval kernels (--eval_policy
    # exact/auto) amortize their one XLA compile per shape across RUNS
    import os as _os
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("VSPW_COMPILE_CACHE",
                            _os.path.expanduser("~/.cache/vspw_xla")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    args = build_eval_clip_parser().parse_args()
    from .config.args import postprocess_args
    postprocess_args(args)
    cfg = default_cfg.clone()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    evaluate_clip(cfg, args, max_videos=args.max_videos, is_save=args.is_save)


if __name__ == "__main__":
    main()
