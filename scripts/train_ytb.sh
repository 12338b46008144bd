#!/usr/bin/env bash
# Ref-YouTube-VOS training from scratch (reference scripts/train_ytb.sh,
# 8 GPUs x bs1 -> global batch 8 on a v5e-8).
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.main -c configs/refer_youtube_vos.yaml -rm train \
  --epochs 30 --version "ytb_from_scratch" --lr_drop 20 -ws 8 -bs 8 --backbone "video-swin-t" \
  -bpp "$DATA_ROOT/pretrained/swin_tiny_patch244_window877_kinetics400_1k.pth"
