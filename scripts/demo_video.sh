#!/usr/bin/env bash
# Single-video demo: overlay the referred object's masks (reference scripts/demo_video.sh).
DATA_ROOT=${DATA_ROOT:-data}
python3 -m neurips2023_soc_tpu.cli.demo_video -c configs/refer_youtube_vos.yaml \
  -b "video-swin-b" \
  -bpp "$DATA_ROOT/pretrained/swin_base_patch244_window877_kinetics400_22k.pth" \
  -ckpt "$DATA_ROOT/SOC/new_joint_base.tar" \
  --video_path "$DATA_ROOT/a2d_sentences/Release/clips320H/0gZz8hESBEs.mp4" \
  --text "the person in the middle"
