#!/bin/bash
# Per-frame OCRNet training + eval (reference: scripts/run_ocr.sh).
DATAROOT="${DATAROOT:-/path/to/VSPW_480p}"
CFG=cvpr2021_vspw_implement_tpu/config/presets/vsp-resnet101dilated-ocr_deepsup.yaml
python train.py --cfg $CFG --dataroot $DATAROOT --batchsize 8 --lr 0.002 \
  --trainfps 2 --cropsize 479 --totalepoch 120 --num_class 124
python test.py --cfg $CFG --dataroot $DATAROOT --num_class 124
