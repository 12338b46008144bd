#!/usr/bin/env bash
# RefCOCO val-split evaluation (reference scripts/eval_coco.sh).
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.main_pretrain -c configs/refcoco_pretrain.yaml -rm test \
  --version "coco_eval" --backbone "video-swin-s" \
  -bpp "$DATA_ROOT/pretrained/swin_small_patch244_window877_kinetics400_1k.pth"
