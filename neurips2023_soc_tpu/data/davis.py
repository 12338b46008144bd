"""Ref-DAVIS-17 dataset — inference only (reference datasets/davis/refer_davis.py
+ infer_davis.py:190-256). Expressions come 4 per annotator; evaluation merges
per-object masks with an argmax over objects per annotator.
"""
from __future__ import annotations

import json
from os import path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from .collate import frames_to_uint8
from .transforms import VideoTransforms


class ReferDAVISDataset:
    """Yields one sample per (video, expression): the full frame sequence +
    metadata; clip chunking happens in the inference driver (the CUDA
    im2col_step=64 limit that forced 36-frame chunks does not exist here —
    chunk length is an HBM/bucketing choice)."""

    def __init__(self, subset_type: str = "valid",
                 dataset_path: str = "data/ref_davis",
                 transforms_kwargs: Optional[Dict] = None):
        self.dataset_path = dataset_path
        self.videos_dir = path.join(dataset_path, "valid", "JPEGImages")
        meta = path.join(dataset_path, "meta_expressions", "valid",
                         "meta_expressions.json")
        with open(meta) as f:
            by_video = json.load(f)["videos"]
        self.samples_list: List[Tuple] = []
        for vid_id, data in by_video.items():
            frames = sorted(data["frames"])
            for exp_id, exp in data["expressions"].items():
                self.samples_list.append(
                    (vid_id, frames, dict(exp, exp_id=exp_id)))
        self.transforms = VideoTransforms("test", **(transforms_kwargs or {}))

    def __len__(self):
        return len(self.samples_list)

    def get_text(self, idx: int) -> str:
        """The expression text exactly as __getitem__ would yield it (test
        transforms never alter text), without decoding the frames — lets the
        inference driver fetch all of a video's expressions while decoding
        its frames only once."""
        return " ".join(self.samples_list[idx][2]["exp"].lower().split())

    def __getitem__(self, idx: int) -> Dict:
        vid_id, frame_indices, exp = self.samples_list[idx]
        text = self.get_text(idx)
        frames = [
            np.asarray(
                Image.open(path.join(self.videos_dir, vid_id, f"{i}.jpg")).convert("RGB"),
                np.float32,
            ) / 255.0
            for i in frame_indices
        ]
        orig_size = frames[0].shape[:2]
        frames, _, _, text = self.transforms(frames, None, None, text)
        return {
            # RAW uint8 frames: InferenceEngine normalizes on device
            "frames": frames_to_uint8(frames),
            "text": text,
            "video_metadata": {
                "video_id": vid_id,
                "frame_indices": list(frame_indices),
                "resized_frame_size": tuple(frames[0].shape[:2]),
                "original_frame_size": tuple(orig_size),
                "exp_id": exp["exp_id"],
            },
        }
