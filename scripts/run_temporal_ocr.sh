#!/bin/bash
# TCB-OCR training + eval (reference: scripts/run_temporal_ocr.sh).
DATAROOT="${DATAROOT:-/path/to/VSPW_480p}"
CFG=cvpr2021_vspw_implement_tpu/config/presets/vsp-resnet101dilated-ocr_deepsup.yaml
python train_clip2.py --cfg $CFG --dataroot $DATAROOT --method clip_ocr \
  --clip_num 4 --dilation2 "3,6,9" --batchsize 8 --lr 0.002 --cropsize 479 \
  --totalepoch 120 --num_class 124
python test_clip2.py --cfg $CFG --dataroot $DATAROOT --method clip_ocr \
  --clip_num 4 --dilation2 "3,6,9" --num_class 124 --use_memory True
