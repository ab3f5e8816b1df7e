#!/bin/bash
# NetWarp training (reference: scripts/run_netwarp.sh): clip_num must be 2.
DATAROOT="${DATAROOT:-/path/to/VSPW_480p}"
CFG=cvpr2021_vspw_implement_tpu/config/presets/vsp-resnet101dilated-ppm_deepsup_clip.yaml
python train_clip2.py --cfg $CFG --dataroot $DATAROOT --method netwarp \
  --clip_num 2 --dilation_num 0 --batchsize 8 --lr 0.002 --cropsize 479 \
  --totalepoch 120 --num_class 124
