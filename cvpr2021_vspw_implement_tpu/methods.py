"""Temporal-method registry: model factory + loss + batch collation per
``--method`` (reference dispatch: train_clip2.py:264-321).

Each entry builds a flax module with the ``(imgs [T+1, B, H, W, 3] target
last) -> outputs`` convention and a loss ``(outputs, batch) -> (loss, acc)``.
"""

from __future__ import annotations

from functools import partial

from .data.loader import collate_clips_in_order, make_collate_target_last
from .models.builder import ModelBuilder

LONGCLIP_METHODS = ("clip_psp", "clip_ocr")
ALLFRAME_METHODS = ("tdnet", "nonlocal3d")


def _build_clip_psp(cfg, args, dtype):
    from .models.clip_psp import ClipPSP, clip_psp_loss
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype,
                                     remat=cfg.TPU.remat, args=args,
                                     pipeline_stages=cfg.TPU.pipeline_stages,
                                     pipeline_micro=cfg.TPU.pipeline_micro,
                                     pipeline_schedule=cfg.TPU.pipeline_schedule)
    model = ClipPSP(encoder=enc, num_class=args.num_class,
                    fc_dim=cfg.MODEL.fc_dim,
                    psp_weight=getattr(args, "psp_weight", False), dtype=dtype)
    loss = partial(clip_psp_loss, deep_sup_scale=args.deepsup_scale)
    return model, loss


def _build_clip_ocr(cfg, args, dtype):
    from .models.clip_ocr import ClipOCRNet, clip_ocr_loss
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype,
                                     remat=cfg.TPU.remat, args=args,
                                     pipeline_stages=cfg.TPU.pipeline_stages,
                                     pipeline_micro=cfg.TPU.pipeline_micro,
                                     pipeline_schedule=cfg.TPU.pipeline_schedule)
    model = ClipOCRNet(encoder=enc, num_class=args.num_class,
                       clipocr_all=getattr(args, "clipocr_all", False),
                       dtype=dtype)
    loss = partial(clip_ocr_loss, deep_sup_scale=args.deepsup_scale,
                   clipocr_all=getattr(args, "clipocr_all", False))
    return model, loss


def _build_netwarp(cfg, args, dtype, ocr: bool = False):
    from .models.netwarp import NetWarp, netwarp_loss
    assert args.clip_num == 2, "netwarp needs clip_num=2 (netwarp.py:91)"
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype,
                                     remat=cfg.TPU.remat, args=args,
                                     pipeline_stages=cfg.TPU.pipeline_stages,
                                     pipeline_micro=cfg.TPU.pipeline_micro,
                                     pipeline_schedule=cfg.TPU.pipeline_schedule)
    model = NetWarp(encoder=enc, num_class=args.num_class,
                    fc_dim=cfg.MODEL.fc_dim, ocr=ocr,
                    raft_iters=cfg.TPU.raft_iters, dtype=dtype)
    loss = partial(netwarp_loss, deep_sup_scale=args.deepsup_scale, ocr=ocr)
    return model, loss


def _build_etc(cfg, args, dtype, ocr: bool = False):
    from .models.etc import ETC, etc_loss
    assert args.clip_num == 2 and args.dilation_num == 0, \
        "ETC needs clip_num=2, dilation_num=0 (ETC.py:70)"
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype,
                                     remat=cfg.TPU.remat, args=args,
                                     pipeline_stages=cfg.TPU.pipeline_stages,
                                     pipeline_micro=cfg.TPU.pipeline_micro,
                                     pipeline_schedule=cfg.TPU.pipeline_schedule)
    model = ETC(encoder=enc, num_class=args.num_class,
                fc_dim=cfg.MODEL.fc_dim, ocr=ocr,
                raft_iters=cfg.TPU.raft_iters, dtype=dtype)
    loss = partial(etc_loss, deep_sup_scale=args.deepsup_scale,
                   st_weight=args.st_weight, ocr=ocr)
    return model, loss


def _build_our_warp(cfg, args, dtype):
    from .models.warp_our import ClipWarpNet, clip_warp_loss
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype,
                                     remat=cfg.TPU.remat, args=args,
                                     pipeline_stages=cfg.TPU.pipeline_stages,
                                     pipeline_micro=cfg.TPU.pipeline_micro,
                                     pipeline_schedule=cfg.TPU.pipeline_schedule)
    model = ClipWarpNet(encoder=enc, num_class=args.num_class,
                        fc_dim=cfg.MODEL.fc_dim, args=args, dtype=dtype)
    loss = partial(clip_warp_loss, deep_sup_scale=args.deepsup_scale,
                   allsup=args.allsup, allsup_scale=args.allsup_scale,
                   fix=getattr(args, "fix", False))
    return model, loss


def _build_propnet(cfg, args, dtype):
    from .models.propnet import PropNet, propnet_loss
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype,
                                     remat=cfg.TPU.remat, args=args,
                                     pipeline_stages=cfg.TPU.pipeline_stages,
                                     pipeline_micro=cfg.TPU.pipeline_micro,
                                     pipeline_schedule=cfg.TPU.pipeline_schedule)
    model = PropNet(encoder=enc, num_class=args.num_class,
                    fc_dim=cfg.MODEL.fc_dim, args=args, dtype=dtype)
    loss = partial(propnet_loss, deep_sup_scale=args.deepsup_scale)
    return model, loss


def _build_warp_merge(cfg, args, dtype):
    from .models.warp_our_merge import OurWarpMerge, warp_merge_loss
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype,
                                     remat=cfg.TPU.remat, args=args,
                                     pipeline_stages=cfg.TPU.pipeline_stages,
                                     pipeline_micro=cfg.TPU.pipeline_micro,
                                     pipeline_schedule=cfg.TPU.pipeline_schedule)
    model = OurWarpMerge(encoder=enc, num_class=args.num_class,
                         fc_dim=cfg.MODEL.fc_dim, args=args, dtype=dtype)
    loss = partial(warp_merge_loss, deep_sup_scale=args.deepsup_scale)
    return model, loss


def _build_nonlocal3d(cfg, args, dtype):
    from .models.nonlocal3d import NonLocal3D, nonlocal3d_loss
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype,
                                     remat=cfg.TPU.remat, args=args,
                                     pipeline_stages=cfg.TPU.pipeline_stages,
                                     pipeline_micro=cfg.TPU.pipeline_micro,
                                     pipeline_schedule=cfg.TPU.pipeline_schedule)
    model = NonLocal3D(encoder=enc, num_class=args.num_class,
                       fc_dim=cfg.MODEL.fc_dim, dtype=dtype)
    return model, nonlocal3d_loss


def _build_hrnetv2_clip(cfg, args, dtype):
    """HRNetV2-clip (TimeAtten frozen-stem clip encoder + per-frame
    decoder).  Capability beyond the reference: models.py:564-565 builds
    this encoder but no reference driver ever evals it — here
    SegmentationModuleClip gets a real CLI (PARITY.md)."""
    from .models.hrnet_clip import (HRNetV2Clip, SegmentationModuleClip,
                                    seg_clip_loss)
    enc = HRNetV2Clip(dtype=dtype, args=args)
    dec = ModelBuilder.build_decoder(cfg.MODEL.arch_decoder,
                                     fc_dim=cfg.MODEL.fc_dim,
                                     num_class=args.num_class, dtype=dtype)
    return SegmentationModuleClip(encoder=enc, decoder=dec), seg_clip_loss


def _build_tdnet(cfg, args, dtype):
    from .models.td4_psp import TD4PSP, td4_loss
    model = TD4PSP(num_class=args.num_class,
                   cropsize=getattr(args, "cropsize", 479), dtype=dtype)
    return model, td4_loss


METHODS = {
    "clip_psp": _build_clip_psp,
    "clip_ocr": _build_clip_ocr,
    "netwarp": _build_netwarp,
    "netwarp_ocr": partial(_build_netwarp, ocr=True),
    "ETC": _build_etc,
    "etc_ocr": partial(_build_etc, ocr=True),
    "our_warp": _build_our_warp,
    "propnet": _build_propnet,
    "our_warp_merge": _build_warp_merge,
    "nonlocal3d": _build_nonlocal3d,
    "tdnet": _build_tdnet,
    "hrnetv2_clip": _build_hrnetv2_clip,
}

def get_collate(method: str, clip_num: int):
    """Batch collation per method (reference: train_clip2.py:50-82).

    * tdnet / nonlocal3d: all frames in order, no designated target;
    * clip_psp / clip_ocr (long clips): target = anchor = sample frame 0;
    * netwarp / ETC / our_warp / propnet / merge (contiguous clips): target
      = the middle frame (pop(clip_num//2) — for even clip_num the later
      middle).
    """
    if method in ALLFRAME_METHODS:
        return collate_clips_in_order
    if method in LONGCLIP_METHODS:
        return make_collate_target_last(0)
    mid = clip_num // 2 if clip_num % 2 == 0 else (clip_num - 1) // 2
    return make_collate_target_last(mid)


def build_method(method: str, cfg, args, dtype=None):
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}")
    return METHODS[method](cfg, args, dtype)
