"""TC (temporal consistency) metric driver (reference: TC_cal.py:41-125).

For each adjacent frame pair of each val video: RAFT flow (20 iters) from
frame t to t+1, nearest-neighbor warp of the t+1 prediction back onto t, and
mIoU between the t prediction and the warped t+1 prediction, accumulated
over all pairs of the first ``--max_videos`` videos (reference: first 100).

TPU-native: one jitted step computes flow AND the warped prediction;
predictions transfer as uint8 maps.  RAFT weights come from a converted
``raft-things`` checkpoint (``--raft_ckpt``; torch .pth auto-converts via
models.import_torch) — with random weights the score is meaningless, so the
driver requires the checkpoint unless ``--allow_random_raft``.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .models.raft import RAFT, pad_to_multiple_of_8, unpad
from .ops.warp import flowwarp
from .utils import Evaluator, setup_logger


def build_parser():
    p = argparse.ArgumentParser(description="TC metric")
    p.add_argument("--dataroot", required=True)
    p.add_argument("--predroot", required=True,
                   help="directory of dumped prediction PNGs per video")
    p.add_argument("--split", default="val")
    p.add_argument("--num_class", type=int, default=124)
    p.add_argument("--max_videos", type=int, default=100)
    p.add_argument("--raft_ckpt", default="",
                   help="raft-things checkpoint (.pth or .msgpack)")
    p.add_argument("--raft_iters", type=int, default=20)
    p.add_argument("--allow_random_raft", action="store_true")
    p.add_argument("--width_bucket", type=int, default=64,
                   help="pad each frame pair to this multiple and run the "
                        "masked RAFT at the reference /8 geometry inside "
                        "the bucket grid — one XLA compile per bucket "
                        "across ALL videos instead of one per distinct "
                        "width (0 = exact per-shape jit)")
    return p


def load_raft_variables(path: str, model, sample_hw=(64, 64)):
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, *sample_hw, 3), jnp.float32)
    variables = model.init({"params": key}, dummy, dummy, test_mode=True)
    if not path:
        return variables
    if path.endswith(".msgpack"):
        from flax import serialization
        with open(path, "rb") as f:
            return serialization.from_bytes(variables, f.read())
    from .models.import_torch import load_raft_checkpoint, merge_variables
    return merge_variables(variables, load_raft_checkpoint(path))


def compute_tc(args, logger=None) -> float:
    logger = logger or setup_logger()
    model = RAFT(iters=args.raft_iters)
    if not args.raft_ckpt and not args.allow_random_raft:
        raise SystemExit("TC needs --raft_ckpt (or --allow_random_raft for "
                         "smoke tests)")
    variables = load_raft_variables(args.raft_ckpt, model)

    @jax.jit
    def step(img1, img2, next_pred):
        p1, pads = pad_to_multiple_of_8(img1)
        p2, _ = pad_to_multiple_of_8(img2)
        _, flow = model.apply(variables, p1, p2, test_mode=True)
        flow = unpad(flow, pads)
        warped = flowwarp(next_pred[..., None].astype(jnp.float32), flow,
                          mode="nearest")
        return warped[..., 0].astype(jnp.int32)

    @jax.jit
    def step_bucketed(img1p, img2p, next_predp, hv, wv):
        # the reference's symmetric /8 InputPadder emulated inside the
        # static bucket grid (same geometry as NetWarp's masked flow path,
        # models/netwarp.py::_flow_masked): roll the true image to the
        # (top, left) pad offset, run the masked RAFT to the /8-aligned
        # valid extent, roll the flow back, nearest-warp with runtime
        # (dim-1) normalization
        from .ops.masked import mask_valid
        pad_h = (((hv // 8) + 1) * 8 - hv) % 8
        pad_w = (((wv // 8) + 1) * 8 - wv) % 8
        top, left = pad_h // 2, pad_w // 2
        h8, w8 = hv + pad_h, wv + pad_w
        r1 = jnp.roll(img1p, (top, left), axis=(1, 2))
        r2 = jnp.roll(img2p, (top, left), axis=(1, 2))
        _, flow = model.apply(variables, r1, r2, test_mode=True,
                              valid_hw=(h8, w8))
        flow = mask_valid(jnp.roll(flow, (-top, -left), axis=(1, 2)),
                          (hv, wv))
        warped = flowwarp(next_predp[..., None].astype(jnp.float32), flow,
                          mode="nearest", valid_hw=(hv, wv))
        return warped[..., 0].astype(jnp.int32)

    def run_pair(img1, img2, next_pred):
        """Dispatch one adjacent pair; returns the warped next prediction
        cropped to the true size."""
        h, w = img1.shape[1:3]
        if not args.width_bucket:
            return np.asarray(step(jnp.asarray(img1), jnp.asarray(img2),
                                   jnp.asarray(next_pred)))
        from .ops.masked import bucket_hw, pad_to
        key = bucket_hw(h, w, args.width_bucket)
        out = step_bucketed(pad_to(jnp.asarray(img1), key),
                            pad_to(jnp.asarray(img2), key),
                            pad_to(jnp.asarray(next_pred[..., None]),
                                   key)[..., 0],
                            jnp.int32(h), jnp.int32(w))
        return np.asarray(out)[:, :h, :w]

    with open(os.path.join(args.dataroot, args.split + ".txt")) as f:
        videos = [l.strip() for l in f if l.strip()]
    if args.max_videos:
        videos = videos[:args.max_videos]

    evaluator = Evaluator(args.num_class)
    for video in videos:
        vdir = os.path.join(args.dataroot, "data", video, "origin")
        frames = sorted(x for x in os.listdir(vdir) if not x.startswith("."))
        for i, name in enumerate(frames[:-1]):
            nxt = frames[i + 1]
            img1 = np.asarray(Image.open(os.path.join(vdir, name)),
                              np.float32)[None]
            img2 = np.asarray(Image.open(os.path.join(vdir, nxt)),
                              np.float32)[None]
            stem = lambda s: os.path.splitext(s)[0] + ".png"
            pred = np.asarray(Image.open(
                os.path.join(args.predroot, video, stem(name))))[None]
            next_pred = np.asarray(Image.open(
                os.path.join(args.predroot, video, stem(nxt))),
                np.int32)[None]
            warped = run_pair(img1, img2, next_pred)
            evaluator.add_batch(pred, warped)
        logger.info(f"TC: processed {video}")
    tc = evaluator.Mean_Intersection_over_Union()
    logger.info(f"TC score is {tc}")
    return tc


def main():
    args = build_parser().parse_args()
    compute_tc(args)


if __name__ == "__main__":
    main()
