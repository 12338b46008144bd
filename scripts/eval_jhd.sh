#!/usr/bin/env bash
# JHMDB-Sentences evaluation of an A2D-trained model (reference scripts/eval_jhd.sh).
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.main -c configs/jhmdb_sentences.yaml -rm test \
  --version "jhd_test" -bs 2 --backbone "video-swin-t" \
  -bpp "$DATA_ROOT/pretrained/swin_tiny_patch244_window877_kinetics400_1k.pth"
