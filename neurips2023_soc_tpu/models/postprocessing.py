"""Postprocessors (reference models/postprocessing.py).

TPU-first split: everything up to binary masks at padded-input resolution is
jitted on device (upsample, sigmoid, threshold, trajectory selection); only
the per-sample unpad -> original-size resize -> RLE/PNG encoding runs on the
host (it is ragged across samples).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import resize_bilinear, resize_nearest


@functools.partial(jax.jit, static_argnames=("pad_h", "pad_w"))
def a2d_device_step(pred_cls, pred_masks, pad_h: int, pad_w: int):
    """Last-layer outputs -> per-frame scores + binary masks at padded size
    (reference A2DSentencesPostProcess, models/postprocessing.py:17-46).

    pred_cls: (T, B, Nq, K); pred_masks: (T, B, Nq, h, w).
    Returns scores (T*B, Nq), masks (T*B, Nq, pad_h, pad_w) bool.
    """
    T, B, Nq = pred_cls.shape[:3]
    scores = jax.nn.sigmoid(pred_cls[..., 0].astype(jnp.float32))
    scores = scores.reshape(T * B, Nq)
    masks = pred_masks.reshape(T * B, Nq, *pred_masks.shape[-2:])
    masks = resize_bilinear(
        masks[..., None].astype(jnp.float32), pad_h, pad_w, align_corners=False
    )[..., 0]
    masks = jax.nn.sigmoid(masks) > 0.5
    return scores, masks


def a2d_postprocess(
    outputs: Dict[str, jnp.ndarray],
    resized_padded_size: Tuple[int, int],
    resized_sizes: Sequence[Tuple[int, int]],
    orig_sizes: Sequence[Tuple[int, int]],
) -> List[Dict]:
    """Full A2D postprocess: device step + host unpad/resize/RLE."""
    from ..evaluation.rle import encode as rle_encode

    scores, masks = a2d_device_step(
        outputs["pred_cls"][-1], outputs["pred_masks"][-1], *resized_padded_size
    )
    scores = np.asarray(scores)
    masks = np.asarray(masks)
    predictions = []
    for f_masks, f_scores, rs, os_ in zip(masks, scores, resized_sizes, orig_sizes):
        h, w = rs
        no_pad = f_masks[:, :h, :w].astype(np.float32)[..., None]
        resized = np.asarray(
            resize_nearest(no_pad, int(os_[0]), int(os_[1]))
        )[..., 0].astype(np.uint8)
        rles = [rle_encode(m) for m in resized]
        predictions.append({"scores": f_scores, "masks": resized, "rle_masks": rles})
    return predictions


@functools.partial(jax.jit, static_argnames=("pad_h", "pad_w"))
def ytvos_device_step(pred_cls, pred_masks, pad_h: int, pad_w: int):
    """Whole-video trajectory selection + mask binarization
    (reference ReferYoutubeVOSPostProcess, models/postprocessing.py:200-221).

    pred_cls: (T, B, Nq, K); pred_masks: (T, B, Nq, h, w).
    Returns (B, T, pad_h, pad_w) bool masks of the selected trajectory.
    """
    prob = jax.nn.sigmoid(pred_cls.astype(jnp.float32)).mean(0)  # (B, Nq, K)
    traj = jnp.argmax(prob.max(-1), axis=-1)  # (B,)
    masks = jnp.transpose(pred_masks, (1, 0, 2, 3, 4))  # (B, T, Nq, h, w)
    sel = jnp.take_along_axis(
        masks, traj[:, None, None, None, None], axis=2
    )[:, :, 0]  # (B, T, h, w)
    sel = resize_bilinear(
        sel[..., None].astype(jnp.float32), pad_h, pad_w, align_corners=False
    )[..., 0]
    return jax.nn.sigmoid(sel) > 0.5


def ytvos_postprocess(
    outputs: Dict[str, jnp.ndarray],
    videos_metadata: List[Dict],
    padded_size: Tuple[int, int],
) -> List[Dict]:
    masks = np.asarray(
        ytvos_device_step(
            outputs["pred_cls"][-1], outputs["pred_masks"][-1], *padded_size
        )
    )
    preds = []
    for vid_masks, meta in zip(masks, videos_metadata):
        rh, rw = meta["resized_frame_size"]
        no_pad = vid_masks[:, :rh, :rw].astype(np.float32)[..., None]
        oh, ow = meta["original_frame_size"]
        resized = np.asarray(resize_nearest(no_pad, int(oh), int(ow)))[..., 0]
        preds.append({**meta, "pred_masks": resized.astype(np.uint8)})
    return preds


@jax.jit
def coco_topk_device_step(pred_cls, pred_boxes):
    """Top-k box selection (reference PostProcess, models/postprocessing.py:60-95).

    pred_cls: (T, B, Nq, K); pred_boxes: (T, B, Nq, 4). Returns
    scores (B, T*Nq), labels (B, T*Nq), boxes xyxy-normalized (B, T*Nq, 4)."""
    from ..utils.boxes import box_cxcywh_to_xyxy

    T, B, Nq, K = pred_cls.shape
    logits = jnp.transpose(pred_cls, (1, 0, 2, 3)).reshape(B, T * Nq, K)
    boxes = jnp.transpose(pred_boxes, (1, 0, 2, 3)).reshape(B, T * Nq, 4)
    prob = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(B, -1)
    k = T * Nq
    topv, topi = jax.lax.top_k(prob, k)
    top_box = topi // K
    labels = topi % K
    boxes = box_cxcywh_to_xyxy(boxes)
    boxes = jnp.take_along_axis(boxes, top_box[..., None], axis=1)
    return topv, labels, boxes
