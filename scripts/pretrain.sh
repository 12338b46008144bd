#!/usr/bin/env bash
# RefCOCO/+/g pretraining with per-epoch validation, best by mean mask-mAP
# (reference scripts/pretrain.sh, 8 GPUs x bs8 -> global batch 64).
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.main_pretrain -c configs/refcoco_pretrain.yaml -rm train \
  --version "coco_pretrain_base" --epochs 30 --lr_drop 15 20 -bs 64 --backbone "video-swin-b" \
  -bpp "$DATA_ROOT/pretrained/swin_base_patch244_window877_kinetics400_22k.pth"
