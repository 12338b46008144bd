#!/usr/bin/env bash
# A2D-Sentences test-split evaluation (reference scripts/eval_a2d.sh);
# set checkpoint_path in the config or pass -ckpt.
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.main -c configs/a2d_sentences.yaml -rm test \
  --version "a2d_test" -bs 2 --backbone "video-swin-b" \
  -bpp "$DATA_ROOT/pretrained/swin_base_patch244_window877_kinetics400_22k.pth"
