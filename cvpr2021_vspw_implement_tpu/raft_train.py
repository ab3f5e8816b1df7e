"""Staged RAFT flow trainer (reference: RAFT/train.py:136-247).

End-to-end driver around models/raft/training.py: stage presets select the
dataset + augmentation (reference: RAFT_core/datasets.py:199-230), the loop
runs the jitted AdamW/OneCycle step with gamma-weighted sequence loss,
checkpoints + validates every VAL_FREQ steps, and supports ``--add_noise``
(host-side uniform-stdv gaussian noise, RAFT/train.py:167-170) and the
BN-freeze rule (BN statistics update only in the chairs stage,
RAFT/train.py:147-148).

TPU-first structure: the step is ONE jitted program (fwd through the
scan'd GRU with per-iteration predictions, sequence loss, global-norm
clip, AdamW, linear one-cycle LR); batches are host-assembled from the
numpy augmentor pipeline and shipped once per step.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


STAGE_PRESETS = {
    # stage -> (min_scale, max_scale, do_flip)  [RAFT_core/datasets.py:199-228]
    "chairs": (-0.1, 1.0, True),
    "things": (-0.4, 0.8, True),
    "sintel": (-0.2, 0.6, True),
    "kitti": (-0.2, 0.4, False),
}

VAL_FREQ = 5000
SUM_FREQ = 100


def build_raft_train_parser():
    p = argparse.ArgumentParser(description="TPU RAFT flow trainer")
    p.add_argument("--name", default="raft")
    p.add_argument("--stage", required=True, choices=sorted(STAGE_PRESETS))
    p.add_argument("--dataroot", required=True,
                   help="dataset root for the chosen stage")
    p.add_argument("--validation", type=str, nargs="*", default=[])
    p.add_argument("--val_dataroot", type=str, default="",
                   help="root for the validation dataset(s); defaults to "
                        "--dataroot")
    p.add_argument("--restore_ckpt", type=str, default="")
    p.add_argument("--lr", type=float, default=0.00002)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--image_size", type=int, nargs="+", default=[384, 512])
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--wdecay", type=float, default=.00005)
    p.add_argument("--epsilon", type=float, default=1e-8)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--add_noise", action="store_true")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--ckpt_dir", type=str, default="checkpoints")
    p.add_argument("--val_freq", type=int, default=VAL_FREQ)
    p.add_argument("--sum_freq", type=int, default=SUM_FREQ)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (the reference's --mixed_precision)")
    p.add_argument("--sintel_mix", type=str, default="C+T+K+S+H",
                   choices=["C+T+K+S+H", "C+T+K/S"],
                   help="sintel-stage training mixture (reference "
                        "RAFT_core/datasets.py:211-224 TRAIN_DS)")
    return p


#: sintel-stage mixture weights (reference: RAFT_core/datasets.py:211-220,
#: TRAIN_DS='C+T+K+S+H'): 100*clean + 100*final + 200*kitti + 5*hd1k +
#: things, each member with its OWN aug params.
SINTEL_MIX = (("sintel_clean", 100), ("sintel_final", 100), ("kitti", 200),
              ("hd1k", 5), ("things_clean", 1))
#: per-member aug params inside the sintel stage (same reference lines):
#: kitti/hd1k use their own scale ranges AND do_flip=True (unlike the
#: kitti STAGE preset, which disables flips).
SINTEL_MIX_AUG = {
    "sintel_clean": (-0.2, 0.6, True),
    "sintel_final": (-0.2, 0.6, True),
    "kitti": (-0.3, 0.5, True),
    "hd1k": (-0.5, 0.2, True),
    "things_clean": (-0.2, 0.6, True),
}


def fetch_dataset(stage: str, dataroot: str, image_size, seed: int,
                  sintel_mix: str = "C+T+K+S+H"):
    """Stage → augmented training dataset (RAFT_core/datasets.py:199-230).

    For ``stage='sintel'`` the training distribution is the reference's
    weighted mixture ``100*clean + 100*final + 200*kitti + 5*hd1k +
    things`` with per-member aug params (SINTEL_MIX / SINTEL_MIX_AUG);
    ``dataroot`` must then be the datasets PARENT directory containing
    ``Sintel/``, ``FlyingThings3D/``, ``KITTI/`` and ``HD1K/`` (the
    reference's ``datasets/`` root).  ``sintel_mix='C+T+K/S'`` selects the
    reference's alternative 100*clean + 100*final + things composition
    (no kitti/hd1k).  Other stages take the dataset's own root directly.
    """
    from .models.raft.datasets import (FlowAugmentor, MixedFlowDataset,
                                       SparseFlowAugmentor, flying_chairs,
                                       flying_things, hd1k, kitti, sintel)

    mn, mx, flip = STAGE_PRESETS[stage]
    if stage == "kitti":
        aug = SparseFlowAugmentor(image_size, mn, mx, flip, seed=seed)
        return kitti(dataroot, "training", aug)
    if stage == "sintel":
        members = SINTEL_MIX if sintel_mix == "C+T+K+S+H" else \
            (("sintel_clean", 100), ("sintel_final", 100),
             ("things_clean", 1))
        parts = []
        for i, (name, mult) in enumerate(members):
            mn_i, mx_i, flip_i = SINTEL_MIX_AUG[name]
            sparse = name in ("kitti", "hd1k")
            aug_cls = SparseFlowAugmentor if sparse else FlowAugmentor
            aug_i = aug_cls(image_size, mn_i, mx_i, flip_i, seed=seed + i)
            if name == "kitti":
                ds = kitti(os.path.join(dataroot, "KITTI"), "training",
                           aug_i)
            elif name == "hd1k":
                ds = hd1k(os.path.join(dataroot, "HD1K"), aug_i)
            elif name == "things_clean":
                ds = flying_things(os.path.join(dataroot, "FlyingThings3D"),
                                   "frames_cleanpass", aug_i)
            else:
                ds = sintel(os.path.join(dataroot, "Sintel"), "training",
                            name.split("_")[1], aug_i)
            assert len(ds) > 0, (
                f"sintel-stage member {name!r} is empty under {dataroot} — "
                "the reference recipe needs Sintel/, FlyingThings3D/, "
                "KITTI/ and HD1K/ under the datasets root "
                "(RAFT_core/datasets.py:211-220)")
            parts.append((ds, mult))
        return MixedFlowDataset(parts)
    aug = FlowAugmentor(image_size, mn, mx, flip, seed=seed)
    if stage == "chairs":
        try:
            return flying_chairs(dataroot, aug, split="training")
        except FileNotFoundError:
            return flying_chairs(dataroot, aug)
    # things
    ds = flying_things(dataroot, "frames_cleanpass", aug)
    ds.triplets += flying_things(dataroot, "frames_finalpass",
                                 aug).triplets
    return ds


def run_validation(model, variables, names, root):
    from .models.raft import datasets as fds
    from .models.raft.training import (validate_chairs, validate_kitti,
                                       validate_sintel)

    results = {}
    for name in names:
        if name == "chairs":
            ds = fds.flying_chairs(os.path.join(root, "FlyingChairs_release"),
                                   split="validation")
            results.update(validate_chairs(model, variables, ds))
        elif name == "sintel":
            for dstype in ("clean", "final"):
                ds = fds.sintel(os.path.join(root, "Sintel"), "training",
                                dstype)
                r = validate_sintel(model, variables, ds)
                results[f"sintel_{dstype}"] = r["epe"]
        elif name == "kitti":
            ds = fds.kitti(os.path.join(root, "KITTI"), "training")
            r = validate_kitti(model, variables, ds)
            results["kitti_epe"], results["kitti_f1"] = r["epe"], r["f1"]
    return results


def train(args, max_steps: int | None = None, logger=None):
    """Returns (variables, final checkpoint path).  ``max_steps`` overrides
    args.num_steps for smoke runs."""
    import jax
    import jax.numpy as jnp

    from .models.raft.raft import RAFT
    from .models.raft.training import (make_flow_optimizer,
                                       make_flow_train_step,
                                       make_flow_train_step_bn)
    import flax.serialization as ser

    from .utils import setup_logger

    def save_msgpack(tree, path):
        with open(path, "wb") as f:
            f.write(ser.msgpack_serialize(jax.device_get(tree)))

    logger = logger or setup_logger()
    num_steps = max_steps or args.num_steps
    rng = np.random.default_rng(args.seed)

    dtype = jnp.bfloat16 if args.bf16 else None
    model = RAFT(iters=args.iters, dtype=dtype)
    h, w = args.image_size
    key = jax.random.PRNGKey(args.seed)
    variables = model.init({"params": key},
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.restore_ckpt:
        import flax.serialization as ser
        with open(args.restore_ckpt, "rb") as f:
            tree = ser.msgpack_restore(f.read())
        params, batch_stats = tree["params"], tree["batch_stats"]
        logger.info(f"restored {args.restore_ckpt}")
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    logger.info(f"Parameter Count: {n_params}")

    tx = make_flow_optimizer(args.lr, num_steps, args.wdecay, args.epsilon,
                             args.clip)
    opt_state = tx.init(params)
    train_bn = args.stage == "chairs"  # RAFT/train.py:147-148
    step_fn = (make_flow_train_step_bn(model, tx, args.gamma) if train_bn
               else make_flow_train_step(model, tx, args.gamma, batch_stats))

    dataset = fetch_dataset(args.stage, args.dataroot, args.image_size,
                            args.seed,
                            sintel_mix=getattr(args, "sintel_mix",
                                               "C+T+K+S+H"))
    assert len(dataset) > 0, f"empty {args.stage} dataset at {args.dataroot}"
    os.makedirs(args.ckpt_dir, exist_ok=True)

    def make_batch():
        idxs = rng.integers(0, len(dataset), args.batch_size)
        i1s, i2s, fls, vls = zip(*(dataset[int(i)] for i in idxs))
        img1 = np.stack(i1s)
        img2 = np.stack(i2s)
        if args.add_noise:
            stdv = rng.uniform(0.0, 5.0)
            img1 = np.clip(img1 + stdv * rng.standard_normal(img1.shape)
                           .astype(np.float32), 0.0, 255.0)
            img2 = np.clip(img2 + stdv * rng.standard_normal(img2.shape)
                           .astype(np.float32), 0.0, 255.0)
        return {"img1": jnp.asarray(img1), "img2": jnp.asarray(img2),
                "flow": jnp.asarray(np.stack(fls)),
                "valid": jnp.asarray(np.stack(vls))}

    running = {}
    for total_steps in range(num_steps):
        batch = make_batch()
        if train_bn:
            params, batch_stats, opt_state, metrics = step_fn(
                params, batch_stats, opt_state, batch)
        else:
            params, opt_state, metrics = step_fn(params, opt_state, batch)
        for k, v in metrics.items():
            running[k] = running.get(k, 0.0) + float(v)
        if total_steps % args.sum_freq == args.sum_freq - 1:
            avg = {k: v / args.sum_freq for k, v in running.items()}
            logger.info(f"step {total_steps + 1}: " + ", ".join(
                f"{k} {v:.4f}" for k, v in sorted(avg.items())))
            running = {}
        if total_steps % args.val_freq == args.val_freq - 1:
            variables = {"params": params, "batch_stats": batch_stats}
            path = os.path.join(args.ckpt_dir,
                                f"{total_steps + 1}_{args.name}.msgpack")
            save_msgpack(variables, path)
            results = run_validation(model, variables, args.validation,
                                     args.val_dataroot or args.dataroot)
            if results:
                logger.info("validation: " + ", ".join(
                    f"{k} {v:.4f}" for k, v in sorted(results.items())))

    variables = {"params": params, "batch_stats": batch_stats}
    final = os.path.join(args.ckpt_dir, f"{args.name}.msgpack")
    save_msgpack(variables, final)
    logger.info(f"saved {final}")
    return variables, final


def main():
    from .utils.misc import honor_platform_env
    honor_platform_env()
    args = build_raft_train_parser().parse_args()
    train(args)


if __name__ == "__main__":
    main()
