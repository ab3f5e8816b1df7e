"""Temporal-method training driver (reference: train_clip2.py).

``--method`` dispatches over the registry in methods.py; the feed convention
(target frame last in the stacked [T, B, ...] clip) is handled by the
collate functions, and the whole step (encode clip, temporal fusion, loss,
backward, clip-recipe SGD with 0.1x encoder LR) is one jitted function over
the GSPMD mesh.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import cfg as default_cfg
from .config.args import build_train_clip_parser, postprocess_args
from .data import ClipDataset, LongClipDataset, PrefetchLoader
from .methods import LONGCLIP_METHODS, build_method, get_collate
from .parallel import (TrainState, create_clip_optimizer, make_mesh,
                       make_train_step)
from .parallel.mesh import auto_data_axis
from .utils import AverageMeter, setup_logger
from .utils.checkpoint import load_checkpoint, save_checkpoint


def train_clip(cfg, args, logger=None, max_steps: int | None = None):
    logger = logger or setup_logger()
    dtype = jnp.bfloat16 if cfg.TPU.compute_dtype == "bfloat16" else None
    model, loss_fn = build_method(args.method, cfg, args, dtype)

    ds_cls = LongClipDataset if args.method in LONGCLIP_METHODS else ClipDataset
    dataset = ds_cls(args, "train", seed=cfg.TRAIN.seed)
    collate = get_collate(args.method, args.clip_num)
    loader = PrefetchLoader(dataset, args.batchsize, collate, shuffle=True,
                            seed=cfg.TRAIN.seed, prefetch=cfg.TPU.prefetch)

    crop = dataset.cropsize
    key = jax.random.PRNGKey(cfg.TRAIN.seed)
    sample = jnp.zeros((args.clip_num, 1, crop[0], crop[1], 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, sample, train=True)
    # reference pretrained-init (--pre_enc/--pre_dec torch checkpoints)
    from .models.import_torch import apply_pretrained_init
    variables = apply_pretrained_init(variables, cfg, args, logger)

    max_iters = len(loader) * args.totalepoch
    tx = create_clip_optimizer(variables["params"], lr=args.lr,
                               max_iters=max_iters, momentum=cfg.TRAIN.beta1,
                               weight_decay=args.weight_decay,
                               lr_pow=cfg.TRAIN.lr_pow,
                               fix_encoder=args.fix)
    state = TrainState.create(variables, tx)

    start_epoch = cfg.TRAIN.start_epoch
    if args.resume_epoch != 0:
        path = os.path.join("./resume", f"model_epoch_{args.resume_epoch}.msgpack")
        state = load_checkpoint(path, state)
        start_epoch = args.resume_epoch
        logger.info(f"resume from epoch {args.resume_epoch}")

    n_data = cfg.TPU.mesh_data
    if n_data in (-1, 0):
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
    # tdnet rotates its 4 paths with pos_id = step % 4 (train_clip2.py:93-94)
    static_kwarg = "pos_id" if args.method == "tdnet" else None
    step_fn = make_train_step(model, tx, loss_fn=loss_fn,
                              static_kwarg=static_kwarg)

    batch_time, data_time = AverageMeter(), AverageMeter()
    ave_loss, ave_acc = AverageMeter(), AverageMeter()
    total_steps = 0
    from jax.sharding import PartitionSpec as P
    from .parallel.mesh import device_prefetch
    with mesh:
        # tensor-parallel param placement via the shared path rules
        # (parallel/sharding.py); replicates everything when mesh_model == 1
        from .parallel import shard_tree
        state = shard_tree(state, mesh)
        for epoch in range(start_epoch, args.totalepoch):
            tic = time.time()
            # clip time axis stays local; batch axis shards over 'data';
            # transfers overlap compute via the prefetch queue
            for i, batch in enumerate(
                    device_prefetch(iter(loader), mesh, P(None, "data"))):
                data_time.update(time.time() - tic)
                if static_kwarg:
                    state, metrics = step_fn(state, batch, key,
                                             (total_steps + 1) % 4)
                else:
                    state, metrics = step_fn(state, batch, key)
                loss, acc = float(metrics["loss"]), float(metrics["acc"])
                batch_time.update(time.time() - tic)
                tic = time.time()
                ave_loss.update(loss)
                ave_acc.update(acc * 100)
                if i % cfg.TRAIN.disp_iter == 0:
                    logger.info(
                        f"Epoch: [{epoch + 1}][{i}/{len(loader)}], "
                        f"Time: {batch_time.average():.2f}, "
                        f"Data: {data_time.average():.2f}, "
                        f"Accuracy: {ave_acc.average():4.2f}, "
                        f"Loss: {ave_loss.average():.6f}")
                total_steps += 1
                if max_steps and total_steps >= max_steps:
                    break
            # reference checkpoints every 20 epochs (train_clip2.py:383);
            # we also checkpoint the final epoch
            if (epoch + 1) % 20 == 0 or (epoch + 1) == args.totalepoch:
                ckpt = save_checkpoint(args.saveroot or cfg.DIR, state, epoch + 1)
                logger.info(f"saved checkpoint {ckpt}")
            if (epoch + 1) % 20 == 0 and getattr(args, "validation", False):
                # in-training validation at each 20-epoch checkpoint
                # (reference train_clip2.py:383-386)
                from .test_clip import evaluate_clip
                val_vars = {"params": state.params,
                            "batch_stats": state.batch_stats}
                # eval-only args the train parser doesn't define
                for k, v in (("split", "val"), ("vc_clip_num", 8),
                             ("is_save", False), ("max_videos", 0)):
                    if not hasattr(args, k):
                        setattr(args, k, v)
                evaluate_clip(cfg, args, variables=val_vars, logger=logger)
            if max_steps and total_steps >= max_steps:
                break
    return state


def main():
    from .utils.misc import honor_platform_env
    honor_platform_env()
    parser = build_train_clip_parser()
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

    logger = setup_logger()
    logger.info(f"Loaded configuration file {args.cfg}")
    os.makedirs(cfg.DIR, exist_ok=True)
    with open(os.path.join(cfg.DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    np.random.seed(cfg.TRAIN.seed)
    train_clip(cfg, args, logger)


if __name__ == "__main__":
    main()
