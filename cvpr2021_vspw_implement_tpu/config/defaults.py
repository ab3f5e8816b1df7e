"""Default configuration tree.

Mirrors the reference yacs surface (reference: config/defaults.py:7-97) so
that the same YAML presets / ``KEY VALUE`` CLI overrides keep working, plus a
``TPU`` section for mesh/precision knobs that have no reference analogue.
"""

from .node import CfgNode as CN

_C = CN()
_C.DIR = "ckpt/vspw-resnet50dilated-ppm_deepsup"

# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------
_C.DATASET = CN()
_C.DATASET.root_dataset = "./data/"
_C.DATASET.list_train = "./data/training.odgt"
_C.DATASET.list_val = "./data/validation.odgt"
_C.DATASET.num_class = 150
_C.DATASET.imgSizes = (300, 375, 450, 525, 600)
_C.DATASET.imgMaxSize = 1000
_C.DATASET.padding_constant = 8
_C.DATASET.segm_downsampling_rate = 8
_C.DATASET.random_flip = True

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------
_C.MODEL = CN()
_C.MODEL.arch_encoder = "resnet50dilated"
_C.MODEL.arch_decoder = "ppm_deepsup"
_C.MODEL.weights_encoder = ""
_C.MODEL.weights_decoder = ""
_C.MODEL.fc_dim = 2048

# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------
_C.TRAIN = CN()
_C.TRAIN.batch_size_per_gpu = 2
_C.TRAIN.num_epoch = 20
_C.TRAIN.start_epoch = 0
_C.TRAIN.epoch_iters = 5000
_C.TRAIN.optim = "SGD"
_C.TRAIN.lr_encoder = 0.02
_C.TRAIN.lr_decoder = 0.02
_C.TRAIN.lr_pow = 0.9
_C.TRAIN.beta1 = 0.9
_C.TRAIN.weight_decay = 1e-4
_C.TRAIN.deep_sup_scale = 0.4
_C.TRAIN.fix_bn = False
_C.TRAIN.workers = 16
_C.TRAIN.disp_iter = 20
_C.TRAIN.seed = 304

# ---------------------------------------------------------------------------
# Validation
# ---------------------------------------------------------------------------
_C.VAL = CN()
_C.VAL.batch_size = 1
_C.VAL.visualize = False
_C.VAL.checkpoint = "epoch_20.pth"

# ---------------------------------------------------------------------------
# Testing
# ---------------------------------------------------------------------------
_C.TEST = CN()
_C.TEST.batch_size = 1
_C.TEST.checkpoint = "epoch_20.pth"
_C.TEST.result = "./"

# ---------------------------------------------------------------------------
# TPU-native knobs (no reference analogue)
# ---------------------------------------------------------------------------
_C.TPU = CN()
# mesh axis sizes; -1 for data means "all remaining devices"
_C.TPU.mesh_data = -1
_C.TPU.mesh_model = 1
# compute dtype for conv/matmul activations ("bfloat16" or "float32");
# parameters and loss stay float32.
_C.TPU.compute_dtype = "bfloat16"
# rematerialisation of backbone stages to trade FLOPs for HBM.  Measured on
# v5e at the reference recipe shape (R101, 4x2x479x479): remat costs ~8%
# step time and is NOT needed for memory even at twice the per-chip batch,
# so it defaults off; enable for larger crops/batches that overflow HBM.
_C.TPU.remat = False
# GPipe pipeline over the dilated trunk's homogeneous layer3 tail
# (models/pipeline.py): number of stages (= mesh 'pipe' axis size; 0 = off)
# and microbatches per step
_C.TPU.pipeline_stages = 0
_C.TPU.pipeline_micro = 1
# backward schedule of the pipelined tail: "gpipe" (plain autodiff; XLA
# keeps O(M) microbatch activations live) or "1f1b" (hand-scheduled
# interleaved backward; O(P) live microbatches + one recompute of the
# section — see models/pipeline.py)
_C.TPU.pipeline_schedule = "gpipe"
# host->device prefetch depth of the input pipeline
_C.TPU.prefetch = 2
# RAFT refinement iterations for the frozen-flow methods (netwarp/etc).
# The reference hard-codes 20 (net_warp.py's raft call); fewer iterations
# trade flow accuracy for train-step time — see ROADMAP "RAFT iterations
# recipe" for the measured EPE-vs-iters and ms-vs-iters curves.
_C.TPU.raft_iters = 20

cfg = _C
