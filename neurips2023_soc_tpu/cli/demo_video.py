"""Single-video referring segmentation demo (reference demo_video.py):
read an mp4 (every Nth frame), run one whole-clip forward, overlay the chosen
trajectory's masks, save PNGs. `--synthetic` runs on a generated clip so the
demo is driveable without data."""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..config import load_config
from ..data.collate import normalize_frames
from ..inference import InferenceEngine
from ..models import build_model
from .infer_refytb import load_params


def overlay(frame_u8: np.ndarray, mask: np.ndarray,
            color=(255, 60, 60), alpha=0.5) -> np.ndarray:
    out = frame_u8.astype(np.float32)
    c = np.asarray(color, np.float32)
    m = mask.astype(bool)
    out[m] = (1 - alpha) * out[m] + alpha * c
    return out.astype(np.uint8)


def main():
    parser = argparse.ArgumentParser("SOC demo")
    parser.add_argument("--config_path", "-c",
                        default="configs/refer_youtube_vos.yaml")
    parser.add_argument("--video_path", default=None)
    parser.add_argument("--text", default="the red square moving right")
    parser.add_argument("--checkpoint_path", "-ckpt", default=None)
    parser.add_argument("--backbone", "-b", default=None)
    parser.add_argument("--backbone_pretrained_path", "-bpp", default=None)
    parser.add_argument("--output_dir", default="outputs/demo")
    parser.add_argument("--frame_stride", type=int, default=5)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_frames", type=int, default=8)
    parser.add_argument("--synthetic_size", type=int, nargs=2,
                        default=(160, 288), metavar=("H", "W"))
    args = parser.parse_args()
    config = load_config(args.config_path, overrides={
        "checkpoint_path": args.checkpoint_path,
        "backbone": args.backbone,
        "backbone_pretrained_path": args.backbone_pretrained_path,
    })

    if args.synthetic:
        from ..data.synthetic import SyntheticRVOSDataset

        s = SyntheticRVOSDataset(num_samples=1,
                                 num_frames=args.synthetic_frames,
                                 frame_size=tuple(args.synthetic_size))[0]
        frames = s["frames"]
        text = s["text"]
        raw = ((frames * np.array([0.229, 0.224, 0.225]) +
                np.array([0.485, 0.456, 0.406])) * 255).clip(0, 255).astype(np.uint8)
    else:
        from ..data.a2d_sentences import read_video_frames_cv2
        from ..data.transforms import VideoTransforms

        video = read_video_frames_cv2(args.video_path)
        video = video[:: args.frame_stride]
        raw = (video * 255).astype(np.uint8)
        tr = VideoTransforms("test", eval_short_size=config.eval_short_size,
                             eval_max_size=config.eval_max_size)
        frames_list, _, _, text = tr(list(video), None, None, args.text)
        frames = normalize_frames(np.stack(frames_list))

    model = build_model(config)
    T = frames.shape[0]
    sample = (
        np.zeros((min(T, 8), 1) + frames.shape[1:3] + (3,), np.float32),
        np.zeros((min(T, 8), 1) + frames.shape[1:3], bool),
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
    masks = engine.infer_video(frames, text, original_size=raw.shape[1:3])

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    for t in range(masks.shape[0]):
        Image.fromarray(overlay(raw[t], masks[t])).save(out / f"{t:05d}.png")
    print(f'text: "{text}"')
    print(f"wrote {masks.shape[0]} overlay frames to {out} "
          f"(mask coverage {masks.mean():.3f})")


if __name__ == "__main__":
    main()
