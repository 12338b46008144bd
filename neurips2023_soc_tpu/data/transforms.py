"""Host-side video transforms (reference datasets/transforms.py, numpy/cv2).

These run in the input pipeline before batching; everything on-device is in
models/. Frames are float32 (H, W, 3) in [0,1] after ToTensor-equivalent;
masks uint8 (N, H, W); boxes float32 (N, 4) xyxy absolute pixels.
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def size_with_aspect_ratio(h: int, w: int, size: int,
                           max_size: Optional[int]) -> Tuple[int, int]:
    """Shorter-side resize target (reference transforms.py:186-205)."""
    if max_size is not None:
        min_orig, max_orig = float(min(w, h)), float(max(w, h))
        if max_orig / min_orig * size > max_size:
            size = int(round(max_size * min_orig / max_orig))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        ow = size
        oh = int(size * h / w)
    else:
        oh = size
        ow = int(size * w / h)
    return oh, ow


def resize_frame(frame: np.ndarray, oh: int, ow: int) -> np.ndarray:
    if cv2 is not None:
        return cv2.resize(frame, (ow, oh), interpolation=cv2.INTER_LINEAR)
    from PIL import Image

    return np.asarray(
        Image.fromarray((frame * 255).astype(np.uint8)).resize((ow, oh))
    ).astype(np.float32) / 255.0


def resize_mask(mask: np.ndarray, oh: int, ow: int) -> np.ndarray:
    if cv2 is not None:
        return cv2.resize(mask, (ow, oh), interpolation=cv2.INTER_NEAREST)
    from PIL import Image

    return np.asarray(Image.fromarray(mask).resize((ow, oh), resample=0))


def hflip_sample(frames, masks, boxes, text):
    """Horizontal flip + left/right word swap (reference
    refer_youtube_vos_dataset.py:254-262)."""
    frames = [f[:, ::-1].copy() for f in frames]
    masks = masks[..., ::-1].copy()
    w = frames[0].shape[1]
    if boxes is not None and boxes.size:
        x0 = boxes[..., 0].copy()
        x2 = boxes[..., 2].copy()
        boxes[..., 0] = w - x2
        boxes[..., 2] = w - x0
    text = text.replace("left", "@").replace("right", "left").replace("@", "right")
    return frames, masks, boxes, text


def photometric_distort(frames: List[np.ndarray], rng: random.Random):
    """Brightness/contrast/saturation/hue jitter applied consistently over the
    clip (reference transforms.py:17-43 PhotometricDistort)."""
    out = [f.copy() for f in frames]
    # brightness
    if rng.random() < 0.5:
        delta = rng.uniform(-32 / 255, 32 / 255)
        out = [np.clip(f + delta, 0, 1) for f in out]
    contrast_first = rng.random() < 0.5
    def contrast(fs):
        if rng.random() < 0.5:
            alpha = rng.uniform(0.5, 1.5)
            return [np.clip(f * alpha, 0, 1) for f in fs]
        return fs
    if contrast_first:
        out = contrast(out)
    # saturation
    if rng.random() < 0.5:
        alpha = rng.uniform(0.5, 1.5)
        res = []
        for f in out:
            gray = f.mean(-1, keepdims=True)
            res.append(np.clip(gray + (f - gray) * alpha, 0, 1))
        out = res
    if not contrast_first:
        out = contrast(out)
    return out


class VideoTransforms:
    """A2dSentencesTransforms equivalent (reference
    refer_youtube_vos_dataset.py:240-270): optional hflip + photometric
    distort (train), deterministic shorter-side resize, normalize happens at
    collate time."""

    def __init__(self, subset_type: str, horizontal_flip_augmentations=True,
                 resize_and_crop_augmentations=True, random_color=False,
                 train_short_size=360, train_max_size=640,
                 eval_short_size=360, eval_max_size=640, seed=None, **kwargs):
        self.train = subset_type == "train"
        self.h_flip = self.train and horizontal_flip_augmentations
        self.random_color = self.train and random_color
        self.do_resize = resize_and_crop_augmentations
        self.size = train_short_size if self.train else eval_short_size
        self.max_size = train_max_size if self.train else eval_max_size
        self.rng = random.Random(seed)

    def __call__(self, frames: List[np.ndarray], masks: Optional[np.ndarray],
                 boxes: Optional[np.ndarray], text: str):
        """frames: list of (H, W, 3) float32 [0,1]; masks (T, N, H, W) uint8;
        boxes (T, N, 4) xyxy absolute. Returns same structures resized."""
        if self.h_flip and self.rng.random() > 0.5:
            frames, masks, boxes, text = hflip_sample(frames, masks, boxes, text)
        if self.random_color and self.rng.random() > 0.5:
            frames = photometric_distort(frames, self.rng)
        if self.do_resize:
            h, w = frames[0].shape[:2]
            oh, ow = size_with_aspect_ratio(h, w, self.size, self.max_size)
            if (oh, ow) != (h, w):
                sy, sx = oh / h, ow / w
                frames = [resize_frame(f, oh, ow) for f in frames]
                if masks is not None and masks.size:
                    T, N = masks.shape[:2]
                    masks = np.stack([
                        np.stack([resize_mask(masks[t, n], oh, ow)
                                  for n in range(N)])
                        for t in range(T)
                    ])
                if boxes is not None and boxes.size:
                    boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
        return frames, masks, boxes, text
