#!/bin/bash
# Staged RAFT training: chairs -> things -> sintel -> kitti with the
# checkpoint handed forward between stages (reference:
# RAFT/train_standard.sh; per-stage LR/steps/batch/crop/wdecay/gamma kept).
#
# Usage:
#   DATASETS=/path/to/datasets bash scripts/run_raft_stages.sh
#
# Layout under $DATASETS (the reference's datasets/ root):
#   FlyingChairs_release/  FlyingThings3D/  Sintel/  KITTI/  HD1K/
# The sintel stage trains on the reference mixture 100*clean + 100*final +
# 200*kitti + 5*hd1k + things (RAFT_core/datasets.py:211-220), so it takes
# $DATASETS itself as the dataroot.
#
# Smoke override (synthetic data, 2-step stages):
#   DATASETS=... NUM_STEPS=2 BATCH=1 CROP="64 64" ITERS=2 VAL="" \
#     bash scripts/run_raft_stages.sh
set -e
DATASETS=${DATASETS:-datasets}
CKPTS=${CKPTS:-checkpoints}
BATCH=${BATCH:-}
CROP=${CROP:-}
VAL=${VAL-default}
ITERS=${ITERS:-12}
mkdir -p "$CKPTS"

run() { python -u -m cvpr2021_vspw_implement_tpu.raft_train \
          --ckpt_dir "$CKPTS" --iters "$ITERS" "$@"; }

# per-stage validation sets (reference train_standard.sh); VAL="" disables
val_args() {
  if [ "$VAL" = "default" ]; then echo "--validation $1 --val_dataroot $DATASETS";
  elif [ -n "$VAL" ]; then echo "--validation $VAL --val_dataroot $DATASETS"; fi
}

run --name raft-chairs --stage chairs \
  --dataroot "$DATASETS/FlyingChairs_release" $(val_args chairs) \
  --num_steps "${NUM_STEPS:-100000}" --batch_size "${BATCH:-12}" \
  --lr 0.0004 --image_size ${CROP:-368 496} --wdecay 0.0001

run --name raft-things --stage things \
  --dataroot "$DATASETS/FlyingThings3D" $(val_args sintel) \
  --restore_ckpt "$CKPTS/raft-chairs.msgpack" \
  --num_steps "${NUM_STEPS:-100000}" --batch_size "${BATCH:-6}" \
  --lr 0.000125 --image_size ${CROP:-400 720} --wdecay 0.0001

run --name raft-sintel --stage sintel \
  --dataroot "$DATASETS" $(val_args sintel) \
  --restore_ckpt "$CKPTS/raft-things.msgpack" \
  --num_steps "${NUM_STEPS:-100000}" --batch_size "${BATCH:-6}" \
  --lr 0.000125 --image_size ${CROP:-368 768} --wdecay 0.00001 --gamma 0.85

run --name raft-kitti --stage kitti \
  --dataroot "$DATASETS/KITTI" $(val_args kitti) \
  --restore_ckpt "$CKPTS/raft-sintel.msgpack" \
  --num_steps "${NUM_STEPS:-50000}" --batch_size "${BATCH:-6}" \
  --lr 0.0001 --image_size ${CROP:-288 960} --wdecay 0.00001 --gamma 0.85
