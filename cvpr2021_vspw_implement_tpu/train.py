"""Per-frame training driver (reference: train.py).

CLI surface mirrors the reference trainer; execution is TPU-native: one
jitted train step (forward+loss+backward+SGD+BN stats) over a GSPMD mesh
with the batch sharded on 'data'.

Usage (reference-compatible):
  python train.py --cfg config/presets/vsp-resnet50dilated-ppm_deepsup.yaml \
      --dataroot /path/VSPW_480p --batchsize 8 --lr 0.01 --cropsize 479 ...
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import cfg as default_cfg
from .config.args import build_train_parser, postprocess_args
from .data import FrameDataset, PrefetchLoader, collate_frames
from .models import ModelBuilder, SegmentationModule
from .parallel import (TrainState, create_frame_optimizer, make_mesh,
                       make_train_step)
from .utils import AverageMeter, setup_logger
from .utils.checkpoint import save_checkpoint


def build_model(cfg, args, dtype=None):
    enc = ModelBuilder.build_encoder(cfg.MODEL.arch_encoder,
                                     fc_dim=cfg.MODEL.fc_dim, dtype=dtype,
                                     remat=cfg.TPU.remat, args=args,
                                     pipeline_stages=cfg.TPU.pipeline_stages,
                                     pipeline_micro=cfg.TPU.pipeline_micro)
    dec = ModelBuilder.build_decoder(cfg.MODEL.arch_decoder,
                                     fc_dim=cfg.MODEL.fc_dim,
                                     num_class=args.num_class, dtype=dtype)
    return SegmentationModule(enc, dec)


def train(cfg, args, logger=None, max_steps: int | None = None):
    logger = logger or setup_logger()
    dtype = jnp.bfloat16 if cfg.TPU.compute_dtype == "bfloat16" else None
    model = build_model(cfg, args, dtype)

    collate = collate_frames
    if getattr(args, "use_clipdataset", False):
        # long-clip frames folded into the batch (reference: train.py:41-50)
        from .data import LongClipDataset
        dataset = LongClipDataset(args, "train", seed=cfg.TRAIN.seed)

        def collate(items):
            imgs = np.concatenate([np.stack(it[0]) for it in items])
            labels = np.concatenate([np.stack(it[1]) for it in items])
            return {"img": imgs.astype(np.float32),
                    "label": labels.astype(np.int32)}
    elif getattr(args, "usetwodata", False):
        # VSPW frame + a frame from the second image dataset per item
        # (reference TwoDataset, dataset2.py:1052-1242)
        from .data import TwoDataset
        dataset = TwoDataset(args, "train", seed=cfg.TRAIN.seed)

        def collate(items):
            imgs = np.stack([it[0][0] for it in items]
                            + [it[1][0] for it in items])
            labels = np.stack([it[0][1] for it in items]
                              + [it[1][1] for it in items])
            return {"img": imgs.astype(np.float32),
                    "label": labels.astype(np.int32)}
    else:
        dataset = FrameDataset(args, "train", seed=cfg.TRAIN.seed)
    loader = PrefetchLoader(dataset, args.batchsize, collate,
                            shuffle=True, seed=cfg.TRAIN.seed,
                            prefetch=cfg.TPU.prefetch)

    crop = dataset.cropsize
    key = jax.random.PRNGKey(cfg.TRAIN.seed)
    sample = jnp.zeros((1, crop[0], crop[1], 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, sample, train=True)
    # reference pretrained-init (--pre_enc/--pre_dec torch checkpoints)
    from .models.import_torch import apply_pretrained_init
    variables = apply_pretrained_init(variables, cfg, args, logger)

    max_iters = cfg.TRAIN.epoch_iters * args.totalepoch
    tx = create_frame_optimizer(variables["params"], lr=args.lr,
                                max_iters=max_iters, momentum=cfg.TRAIN.beta1,
                                weight_decay=args.weight_decay,
                                lr_pow=cfg.TRAIN.lr_pow)
    state = TrainState.create(variables, tx)
    start_epoch = cfg.TRAIN.start_epoch
    skip_batches = 0
    if getattr(args, "resume", False):
        from .utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                       newest_of)
        latest = newest_of(latest_checkpoint(cfg.DIR),
                           latest_checkpoint(cfg.DIR, prefix="preempt_"))
        if latest:
            state = load_checkpoint(latest, state)
            # position in the run comes from the restored optimizer step —
            # exact for BOTH epoch-boundary and mid-epoch (preemption)
            # checkpoints.  The per-epoch shuffle is seeded by epoch
            # (data/loader.py), so skipping the consumed batches replays
            # the uninterrupted run's data order step for step.
            total = int(state.step)
            start_epoch = total // len(loader)
            skip_batches = total % len(loader)
            logger.info(f"resumed from {latest} (epoch {start_epoch}, "
                        f"step {total}, skipping {skip_batches} batches)")
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"model params: {n_params/1e6:.1f}M; "
                f"iters/epoch: {len(loader)}")

    n_data = cfg.TPU.mesh_data
    if n_data in (-1, 0):
        from .parallel.mesh import auto_data_axis
        n_pipe = max(cfg.TPU.pipeline_stages, 1)
        n_data = auto_data_axis(
            args.batchsize,
            len(jax.devices()) // (cfg.TPU.mesh_model * n_pipe))
    if cfg.TPU.pipeline_stages > 1:
        from .parallel.mesh import make_pipe_mesh
        mesh = make_pipe_mesh(n_data, cfg.TPU.pipeline_stages,
                              cfg.TPU.mesh_model)
    else:
        mesh = make_mesh(n_data, cfg.TPU.mesh_model)
    step_fn = make_train_step(
        model, tx, deep_sup_scale=cfg.TRAIN.deep_sup_scale)

    from .utils.checkpoint import PreemptionCheckpointer
    preempt = PreemptionCheckpointer(cfg.DIR)

    profile_dir = getattr(args, "profile_dir", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    batch_time, data_time = AverageMeter(), AverageMeter()
    ave_loss, ave_acc = AverageMeter(), AverageMeter()
    total_steps = 0
    from .parallel.mesh import device_prefetch
    with mesh:
        # tensor-parallel param placement via the shared path rules
        # (parallel/sharding.py); replicates everything when mesh_model == 1
        from .parallel import shard_tree
        state = shard_tree(state, mesh)
        for epoch in range(start_epoch, args.totalepoch):
            tic = time.time()
            # the loader's shuffle is keyed by ITS epoch counter; align it
            # with the training epoch so a resumed run replays the same
            # index order the uninterrupted run would have used
            loader.epoch = epoch
            for i, batch in enumerate(device_prefetch(iter(loader), mesh)):
                if epoch == start_epoch and i < skip_batches:
                    tic = time.time()
                    continue
                data_time.update(time.time() - tic)
                state, metrics = step_fn(state, batch, key)
                if profile_dir and total_steps == 3:
                    jax.profiler.stop_trace()
                    logger.info(f"profiler trace written to {profile_dir}")
                    profile_dir = ""
                if preempt.requested:
                    path = preempt.maybe_save(state, total_steps)
                    logger.info(f"preemption: saved {path}; exiting")
                    return state
                loss = float(metrics["loss"])
                acc = float(metrics["acc"])
                batch_time.update(time.time() - tic)
                tic = time.time()
                ave_loss.update(loss)
                ave_acc.update(acc * 100)
                if i % cfg.TRAIN.disp_iter == 0:
                    logger.info(
                        f"Epoch: [{epoch}][{i}/{len(loader)}], "
                        f"Time: {batch_time.average():.2f}, "
                        f"Data: {data_time.average():.2f}, "
                        f"Loss: {ave_loss.average():.4f}, "
                        f"Acc: {ave_acc.average():.2f}")
                total_steps += 1
                if max_steps and total_steps >= max_steps:
                    break
            ckpt = save_checkpoint(cfg.DIR, state, epoch + 1)
            logger.info(f"saved checkpoint {ckpt}")
            if max_steps and total_steps >= max_steps:
                break
    return state


def main():
    from .utils.misc import honor_platform_env
    honor_platform_env()
    parser = build_train_parser()
    args = parser.parse_args()
    postprocess_args(args)
    cfg = default_cfg.clone()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.DATASET.num_class = args.num_class
    cfg.TRAIN.num_epoch = args.totalepoch
    cfg.TRAIN.weight_decay = args.weight_decay
    cfg.TRAIN.lr_encoder = cfg.TRAIN.lr_decoder = args.lr
    if getattr(args, "use_float16", False):
        # the reference's AMP flag (train.py:69-81) → bf16 compute on TPU
        cfg.TPU.compute_dtype = "bfloat16"

    logger = setup_logger()
    logger.info(f"Loaded configuration file {args.cfg}")
    os.makedirs(cfg.DIR, exist_ok=True)
    with open(os.path.join(cfg.DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    np.random.seed(cfg.TRAIN.seed)
    state = train(cfg, args, logger)

    if getattr(args, "validation", False):
        # reference chains val inference after training (scripts/run_psp.sh)
        from .test import evaluate
        import argparse as _ap
        eval_args = _ap.Namespace(
            dataroot=args.dataroot, split="val", num_class=args.num_class,
            load="", saveroot=args.saveroot, lesslabel=args.lesslabel,
            use_720p=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        evaluate(cfg, eval_args, variables=variables, logger=logger)


if __name__ == "__main__":
    main()
