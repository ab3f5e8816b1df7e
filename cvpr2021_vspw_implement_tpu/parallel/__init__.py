from .mesh import batch_sharding, make_mesh, replicated, shard_batch
from .optim import (create_clip_optimizer, create_frame_optimizer,
                    make_lr_mult, make_masks, poly_schedule, scale_by_tree)
from .sharding import shard_tree, tp_spec
from .train_state import TrainState, make_eval_step, make_train_step

__all__ = [
    "batch_sharding", "make_mesh", "replicated", "shard_batch",
    "create_clip_optimizer", "create_frame_optimizer", "make_lr_mult",
    "make_masks", "poly_schedule", "scale_by_tree",
    "shard_tree", "tp_spec",
    "TrainState", "make_eval_step", "make_train_step",
]
