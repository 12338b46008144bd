#!/usr/bin/env bash
# Joint RefCOCO+YTVOS training (reference scripts/train_joint.sh).
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.main_joint -c configs/joint.yaml -rm train \
  --epochs 30 --version "joint_base" --lr_drop 20 -ws 8 -bs 8 --backbone "video-swin-b" \
  -bpp "$DATA_ROOT/pretrained/swin_base_patch244_window877_kinetics400_22k.pth"
