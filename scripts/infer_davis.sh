#!/usr/bin/env bash
# Ref-DAVIS-17 inference + local J&F for every annotator
# (reference scripts/infer_davis.sh; no sleep needed — runs are synchronous).
DATA_ROOT=${DATA_ROOT:-data}
OUT=outputs/davis_base_joint
python3 -m neurips2023_soc_tpu.cli.infer_davis -c configs/davis.yaml -rm infer \
  --version "davis_base_joint" --backbone "video-swin-b" \
  -bpp "$DATA_ROOT/pretrained/swin_base_patch244_window877_kinetics400_22k.pth" \
  -ckpt "$DATA_ROOT/SOC/new_joint_base.tar" --output_dir "$OUT"
# eval_davis iterates anno_0..3 under results_path itself
python3 -m neurips2023_soc_tpu.cli.eval_davis --davis_path "$DATA_ROOT/ref-davis/DAVIS" \
  --results_path "$OUT"
