"""Per-frame evaluation driver (reference: test.py).

Per-video loop computing global + per-video confusion-matrix metrics and
optional palette PNG prediction dumps.  Predictions are identical to the
reference's argmax-of-softmax (see models.segmentation.inference_pred).
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
from .data import TestFrameDataset, list_videos
from .models import ModelBuilder, SegmentationModule, inference_pred
from .utils import Evaluator, setup_logger, vspw_palette


def build_eval_parser():
    parser = argparse.ArgumentParser(description="TPU Segmentation Eval")
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--dataroot", type=str, default="")
    parser.add_argument("--split", type=str, default="val")
    parser.add_argument("--num_class", type=int, default=124)
    parser.add_argument("--load", type=str, default="",
                        help="checkpoint (.msgpack) to evaluate")
    parser.add_argument("--torch_enc", "--load_en", dest="torch_enc",
                        type=str, default="",
                        help="reference torch encoder .pth (encoder_epoch_N)")
    parser.add_argument("--torch_dec", "--load_de", dest="torch_dec",
                        type=str, default="",
                        help="reference torch decoder .pth (decoder_epoch_N)")
    parser.add_argument("--saveroot", type=str, default="")
    parser.add_argument("--is_save", action="store_true")
    parser.add_argument("--lesslabel", action="store_true")
    parser.add_argument("--use_720p", action="store_true")
    parser.add_argument("--max_videos", type=int, default=0)
    parser.add_argument("--width_bucket", type=int, default=64,
                        help="pad eval frame WIDTHS to multiples of this (heights round to the stride, 32) and "
                             "reuse one compiled kernel per bucket "
                             "(ops/masked.py; 0 = compile per distinct "
                             "shape); predictions are bit-identical")
    parser.add_argument("--serve_dtype", choices=("bf16", "int8"),
                        default="bf16",
                        help="'int8' quantizes the wide spatial convs for "
                             "serving (ops/quant.py; accuracy/throughput "
                             "trade, see test_clip.py --serve_dtype)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


#: decoder families with masked width-bucketed eval support; every encoder
#: qualifies (hrnet's cross-resolution fusion upsamples are runtime-masked
#: via resize_bilinear_rt, hrnet.py).  hrnetv2_clip takes a (target, clip)
#: input pair this per-frame driver cannot feed — its masked eval lives on
#: SegmentationModuleClip(valid_hw=...) (models/hrnet_clip.py), dispatched
#: by ``test_clip.py --method hrnetv2_clip``
BUCKETED_DECODERS = {"c1", "c1_deepsup", "ppm", "ppm_deepsup",
                     "upernet", "upernet_lite",
                     "ocrnet_deepsup", "deeplab", "nonlocal2d"}
UNBUCKETED_ENCODERS = ("hrnetv2_clip",)


def evaluate(cfg, args, variables=None, logger=None, max_videos: int = 0,
             is_save: bool = False):
    """Returns (metrics dict, per-video mIoU dict)."""
    if getattr(args, "serve_dtype", "bf16") == "int8":
        # opt-in quantized serving (see test_clip.py / ops/quant.py)
        from .ops.quant import int8_trunk
        with int8_trunk():
            return _evaluate(cfg, args, variables, logger, max_videos,
                             is_save)
    return _evaluate(cfg, args, variables, logger, max_videos, is_save)


def _evaluate(cfg, args, variables=None, logger=None, max_videos: int = 0,
              is_save: bool = False):
    logger = logger or setup_logger()
    dtype = jnp.bfloat16 if cfg.TPU.compute_dtype == "bfloat16" else None
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype)
    dec = ModelBuilder.build_decoder(cfg.MODEL.arch_decoder,
                                     fc_dim=cfg.MODEL.fc_dim,
                                     num_class=args.num_class, dtype=dtype)
    model = SegmentationModule(enc, dec)

    if variables is None:
        key = jax.random.PRNGKey(0)
        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init({"params": key}, sample, train=False)
        if args.load:
            # checkpoints store the full TrainState; restore params+stats
            import flax.serialization as ser
            with open(args.load, "rb") as f:
                tree = ser.msgpack_restore(f.read())
            variables = {"params": tree["params"],
                         "batch_stats": tree["batch_stats"]}
            logger.info(f"loaded checkpoint {args.load}")
        if getattr(args, "torch_enc", ""):
            # reference torch encoder checkpoint (per-pixel fidelity path)
            import torch as _torch
            from .models.import_torch import (import_encoder_by_arch,
                                              merge_variables)
            imported = import_encoder_by_arch(
                cfg.MODEL.arch_encoder,
                _torch.load(args.torch_enc, map_location="cpu"))
            variables = merge_variables(
                dict(variables),
                {c: {"encoder": v} for c, v in imported.items()})
            logger.info(f"imported torch encoder {args.torch_enc}")
        if getattr(args, "torch_dec", ""):
            import torch as _torch
            from .models.import_torch import (import_decoder_by_arch,
                                              merge_variables)
            imported = import_decoder_by_arch(
                cfg.MODEL.arch_decoder,
                _torch.load(args.torch_dec, map_location="cpu"))
            variables = merge_variables(
                dict(variables),
                {c: {"decoder": v} for c, v in imported.items()})
            logger.info(f"imported torch decoder {args.torch_dec}")

    # checkpoints written by a GPipe-pipelined trainer store the trunk's
    # tail blocks stacked; eval runs the standard layout (exact conversion)
    from .models.pipeline import maybe_unpipeline
    variables = maybe_unpipeline(variables)

    bucket = getattr(args, "width_bucket", 0)
    if (bucket and cfg.MODEL.arch_decoder.lower() in BUCKETED_DECODERS
            and not cfg.MODEL.arch_encoder.lower().startswith(
                UNBUCKETED_ENCODERS)):
        # width-bucketed masked eval: one compile per bucket, predictions
        # bit-identical to the per-shape path (tests/test_masked_eval.py)
        from .models.segmentation import inference_pred_rt
        from .ops.masked import bucket_hw, feature_valid, pad_to

        _cache = {}

        def infer(img):
            h, w = img.shape[1:3]
            key = bucket_hw(h, w, bucket)
            fn = _cache.get(key)
            if fn is None:
                @jax.jit
                def fn(imgp, hv, wv):
                    outs = model.apply(variables, imgp, train=False,
                                       valid_hw=(hv, wv))
                    logits = outs[0]
                    fv = feature_valid(logits.shape[1], logits.shape[2],
                                       (hv, wv), key)
                    return inference_pred_rt((logits,), key, fv, (hv, wv))

                _cache[key] = fn
            pred = fn(pad_to(img, key), jnp.int32(h), jnp.int32(w))
            return pred[:, :h, :w]
    else:
        @jax.jit
        def infer(img):
            outs = model.apply(variables, img, train=False)
            return inference_pred(outs, img.shape[1:3])

    evaluator = Evaluator(args.num_class)
    vmiou = {}
    palette = vspw_palette()
    videos = list_videos(args.dataroot, args.split)
    if max_videos:
        videos = videos[:max_videos]

    for video in videos:
        ds = TestFrameDataset(args.dataroot, video, args)
        eval_video = Evaluator(args.num_class)
        for i in range(len(ds)):
            img, gt, gtname = ds[i]
            pred = np.asarray(infer(jnp.asarray(img[None])))[0]
            evaluator.add_batch(gt[None], pred[None])
            eval_video.add_batch(gt[None], pred[None])
            if is_save and args.saveroot:
                odir = os.path.join(args.saveroot, video)
                os.makedirs(odir, exist_ok=True)
                out = Image.fromarray(pred.astype(np.uint8), mode="P")
                out.putpalette(palette)
                out.save(os.path.join(odir, gtname))
        vmiou[video] = eval_video.Mean_Intersection_over_Union()
        logger.info(f"video {video}: mIoU {vmiou[video]:.4f}")

    metrics = {
        "Acc": evaluator.Pixel_Accuracy(),
        "Acc_class": evaluator.Pixel_Accuracy_Class(),
        "mIoU": evaluator.Mean_Intersection_over_Union(),
        "fwIoU": evaluator.Frequency_Weighted_Intersection_over_Union(),
        "video_mIoU": float(np.nanmean(list(vmiou.values()))),
    }
    logger.info(
        "Acc:{Acc:.4f}, Acc_class:{Acc_class:.4f}, mIoU:{mIoU:.4f}, "
        "fwIoU:{fwIoU:.4f}, video mIoU:{video_mIoU:.4f}".format(**metrics))
    if args.saveroot:
        os.makedirs(args.saveroot, exist_ok=True)
        with open(os.path.join(args.saveroot, "vmiou.pkl"), "wb") as f:
            pickle.dump(vmiou, f)
    return metrics, vmiou


def main():
    from .utils.misc import honor_platform_env
    honor_platform_env()
    args = build_eval_parser().parse_args()
    cfg = default_cfg.clone()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    evaluate(cfg, args, max_videos=args.max_videos, is_save=args.is_save)


if __name__ == "__main__":
    main()
