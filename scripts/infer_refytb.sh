#!/usr/bin/env bash
# Ref-YTVOS valid-split inference -> Annotations/ + submission.zip
# (reference scripts/infer_refytb.sh). Add --visualize for overlays.
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.infer_refytb -c configs/refer_youtube_vos.yaml -rm infer \
  --version "joint_base_test" --backbone "video-swin-b" \
  -bpp "$DATA_ROOT/pretrained/swin_base_patch244_window877_kinetics400_1k.pth" \
  -ckpt "$DATA_ROOT/SOC/new_joint_base.tar"
