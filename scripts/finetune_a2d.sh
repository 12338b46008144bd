#!/usr/bin/env bash
# A2D fine-tune from a RefCOCO-pretrained checkpoint (reference scripts/finetune_a2d.sh).
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.main -c configs/a2d_sentences.yaml -rm train \
  --epochs 20 -pw "$DATA_ROOT/pretrained_coco/best.pth.tar" --version "finetune_a2d" \
  --lr_drop 20 -ws 8 -bs 8 --backbone "video-swin-t" \
  -bpp "$DATA_ROOT/pretrained/swin_tiny_patch244_window877_kinetics400_1k.pth"
