#!/bin/bash
# Per-frame PSPNet training + eval (reference: scripts/run_psp.sh).
# Flags map 1:1 onto the reference CLI; GPU knobs select mesh shards.
DATAROOT="${DATAROOT:-/path/to/VSPW_480p}"
SAVE=./savemodel
BATCHSIZE=8
CROPSIZE=479
TRAINFPS=2
EPOCH=120
LR=0.002
ARCH=resnet101
CFG=cvpr2021_vspw_implement_tpu/config/presets/vsp-${ARCH}dilated-ppm_deepsup.yaml

python train.py --cfg $CFG --batchsize $BATCHSIZE --dataroot $DATAROOT \
  --trainfps $TRAINFPS --lr $LR --multi_scale True --saveroot $SAVE \
  --totalepoch $EPOCH --cropsize $CROPSIZE --num_class 124

python test.py --cfg $CFG --dataroot $DATAROOT --num_class 124 \
  --load "ckpt/vsp-${ARCH}dilated-ppm_deepsup/model_epoch_${EPOCH}.msgpack" \
  --saveroot ./prediction --is_save
