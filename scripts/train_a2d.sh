#!/usr/bin/env bash
# A2D-Sentences fine-tuning (reference scripts/train_a2d.sh).
# One TPU host drives every local chip; batch_size is GLOBAL and must divide
# the chip count (the reference's -ng 2 -bs 2 == global batch 4... its -bs is
# per-GPU; ours is global, so bs_ours = bs_ref * ng_ref).
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.main -c configs/a2d_sentences.yaml -rm train \
  --epochs 40 --version "a2d" --lr_drop 15 -ws 8 -bs 4 --backbone "video-swin-t" \
  -bpp "$DATA_ROOT/pretrained/swin_tiny_patch244_window877_kinetics400_1k.pth"
