#!/usr/bin/env bash
# Ref-YTVOS fine-tune from a RefCOCO-pretrained checkpoint (reference scripts/finetune_ytb.sh).
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.main -c configs/refer_youtube_vos.yaml -rm train \
  --epochs 20 -pw "$DATA_ROOT/pretrained_coco/best.pth.tar" --version "finetune_ytb" \
  --lr_drop 10 -ws 8 -bs 8 --backbone "video-swin-t" \
  -bpp "$DATA_ROOT/pretrained/swin_tiny_patch244_window877_kinetics400_1k.pth"
