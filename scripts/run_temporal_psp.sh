#!/bin/bash
# TCB-PSP training + eval (reference: scripts/run_temporal_psp.sh).
DATAROOT="${DATAROOT:-/path/to/VSPW_480p}"
SAVE=./savemodel
BATCHSIZE=8
CROPSIZE=479
EPOCH=120
LR=0.002
CLIPNUM=4
DILATION2="3,6,9"
METHOD=clip_psp
ARCH=resnet101
CFG=cvpr2021_vspw_implement_tpu/config/presets/vsp-${ARCH}dilated-ppm_deepsup_clip.yaml

python train_clip2.py --cfg $CFG --batchsize $BATCHSIZE --dataroot $DATAROOT \
  --lr $LR --saveroot $SAVE --totalepoch $EPOCH --cropsize $CROPSIZE \
  --clip_num $CLIPNUM --dilation2 $DILATION2 --method $METHOD --num_class 124

python test_clip2.py --cfg $CFG --dataroot $DATAROOT --method $METHOD \
  --clip_num $CLIPNUM --dilation2 $DILATION2 --num_class 124 \
  --load "$SAVE/model_epoch_${EPOCH}.msgpack" --saveroot ./prediction --is_save
