"""Single-sample prediction CLI (reference predict.py): run one video +
expression through the model and save the chosen trajectory's masks."""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..config import load_config
from ..data.a2d_sentences import read_video_frames_cv2
from ..data.collate import normalize_frames
from ..data.transforms import VideoTransforms
from ..inference import InferenceEngine
from ..models import build_model
from .infer_refytb import load_params


def main():
    parser = argparse.ArgumentParser("SOC predict")
    parser.add_argument("--config_path", "-c",
                        default="configs/refer_youtube_vos.yaml")
    parser.add_argument("--video_path", required=True)
    parser.add_argument("--text", required=True)
    parser.add_argument("--checkpoint_path", "-ckpt", default=None)
    parser.add_argument("--output_dir", default="outputs/predict")
    args = parser.parse_args()
    config = load_config(args.config_path,
                         overrides={"checkpoint_path": args.checkpoint_path})

    video = read_video_frames_cv2(args.video_path)
    orig_size = video.shape[1:3]
    tr = VideoTransforms("test", eval_short_size=config.eval_short_size,
                         eval_max_size=config.eval_max_size)
    frames_list, _, _, text = tr(list(video), None, None, args.text)
    frames = normalize_frames(np.stack(frames_list))

    model = build_model(config)
    sample = (
        np.zeros((8, 1) + frames.shape[1:3] + (3,), np.float32),
        np.zeros((8, 1) + frames.shape[1:3], bool),
        np.ones((1, config.get("text_bucket", 32)), np.int32),
        np.ones((1, config.get("text_bucket", 32)), np.int32),
    )
    params = load_params(config, model, sample)
    engine = InferenceEngine(
        model, params, text_encoder_type=config.text_encoder_type,
        text_bucket=config.get("text_bucket", 32),
        size_buckets=((frames.shape[1], frames.shape[2]),),
        time_buckets=config.get("time_buckets"),
    )
    masks = engine.infer_video(frames, text, original_size=orig_size)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    for t in range(masks.shape[0]):
        Image.fromarray(masks[t] * 255).save(out / f"{t:05d}.png")
    print(f"wrote {masks.shape[0]} masks to {out}")


if __name__ == "__main__":
    main()
