"""Fixed-shape padded batches — the TPU replacement for the reference's
NestedTensor (reference misc.py:103-160).

Under XLA every shape is compiled, so instead of "pad to the max of this
batch" we pad to *bucketed* static shapes: a small ladder of (H, W) sizes and
clip lengths. A batch is a plain dict of arrays (pytree-friendly):

  pixels:   (T, B, H, W, 3) float32/bfloat16, zero padded
  pad_mask: (T, B, H, W)    bool, True on padded pixels (matches reference)

Bucketing keeps the number of distinct compiled programs tiny while wasting
little compute (SURVEY.md §7 "disciplined bucketing/padding story").
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

# Default spatial buckets for the two shipped training resolutions
# (360/640 for Ref-YTVOS, 320/576 for A2D; reference configs).  All multiples
# of 64 so every level of the stride-4..64 pyramid stays integral.
DEFAULT_SIZE_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (256, 448),
    (320, 576),
    (384, 640),
    (448, 768),
    (512, 896),
)

DEFAULT_TIME_BUCKETS: Tuple[int, ...] = (1, 8, 16, 32, 64)


def eval_size_buckets(
    short_size: int, max_size: int
) -> Tuple[Tuple[int, int], ...]:
    """Size buckets covering BOTH orientations of eval-resized frames.

    The eval transforms resize the short side to `short_size` with the long
    side capped at `max_size`, so every resized frame fits (short, max) when
    landscape/square and (max, short) when portrait. The reference's dynamic
    NestedTensor padding absorbs either orientation implicitly
    (misc.py:143-160); static XLA buckets must enumerate both. Programs
    compile lazily per bucket geometry, so the portrait bucket costs nothing
    until a portrait video actually shows up."""
    if short_size == max_size:
        return ((short_size, max_size),)
    return ((short_size, max_size), (max_size, short_size))


def train_size_buckets(
    short_size: int, max_size: int
) -> Tuple[Tuple[int, int], ...]:
    """eval_size_buckets plus the (max, max) square: a BATCH that mixes
    portrait and landscape samples pads to the per-dim max over the batch —
    exactly what the reference's NestedTensor does (misc.py:143-160) — and
    only the square bucket absorbs that. Lazily compiled like the rest, so
    single-orientation corpora never pay for it."""
    if short_size == max_size:
        return ((short_size, max_size),)
    return ((short_size, max_size), (max_size, short_size),
            (max_size, max_size))


def pick_size_bucket(
    h: int, w: int, buckets: Sequence[Tuple[int, int]] = DEFAULT_SIZE_BUCKETS
) -> Tuple[int, int]:
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            return bh, bw
    raise ValueError(
        f"frame size ({h}, {w}) exceeds every size bucket {tuple(buckets)}; "
        "resize the frames first (the CLIs resize to the training short side) "
        "or pass larger size_buckets")


def pick_time_bucket(t: int, buckets: Sequence[int] = DEFAULT_TIME_BUCKETS) -> int:
    for bt in buckets:
        if t <= bt:
            return bt
    raise ValueError(
        f"clip length {t} exceeds every time bucket {tuple(buckets)}; "
        "chunk the video (InferenceEngine does) or pass larger time_buckets")


def batch_videos(
    videos: List[List[np.ndarray]],
    size_buckets: Sequence[Tuple[int, int]] = DEFAULT_SIZE_BUCKETS,
    time_buckets: Sequence[int] = DEFAULT_TIME_BUCKETS,
    dtype=np.float32,
):
    """Batch a list of videos (each a list of (H, W, 3) frames) into a padded
    (T, B, H, W, 3) pixel tensor + (T, B, H, W) pad mask with bucketed static
    shapes. Equivalent role to reference misc.py:143-160.
    """
    B = len(videos)
    t_max = max(len(v) for v in videos)
    h_max = max(f.shape[0] for v in videos for f in v)
    w_max = max(f.shape[1] for v in videos for f in v)
    T = pick_time_bucket(t_max, time_buckets)
    H, W = pick_size_bucket(h_max, w_max, size_buckets)

    pixels = np.zeros((T, B, H, W, 3), dtype=dtype)
    pad_mask = np.ones((T, B, H, W), dtype=bool)
    for b, video in enumerate(videos):
        for t, frame in enumerate(video):
            fh, fw = frame.shape[:2]
            pixels[t, b, :fh, :fw] = frame
            pad_mask[t, b, :fh, :fw] = False
    return pixels, pad_mask


def pad_instances(
    arrays: List[np.ndarray], max_n: int, pad_value=0
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a ragged list of per-sample instance arrays to (B, max_n, ...) with
    a validity mask (B, max_n)."""
    B = len(arrays)
    trailing = arrays[0].shape[1:] if len(arrays) and arrays[0].ndim > 1 else ()
    out = np.full((B, max_n) + trailing, pad_value, dtype=arrays[0].dtype)
    valid = np.zeros((B, max_n), dtype=bool)
    for b, a in enumerate(arrays):
        n = min(len(a), max_n)
        out[b, :n] = a[:n]
        valid[b, :n] = True
    return out, valid
