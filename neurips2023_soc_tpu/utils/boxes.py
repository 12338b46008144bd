"""Box / GIoU math and small numeric helpers (jnp equivalents of the
reference's misc.py:382-431)."""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU. boxes1: (..., N, 4), boxes2: (..., M, 4), xyxy."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/), xyxy boxes.

    Unlike the torch reference we do not assert on degenerate boxes (that is
    untraceable); callers mask invalid entries instead.
    """
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-9)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) binary masks -> (..., 4) xyxy boxes (zeros for empty masks)."""
    h, w = masks.shape[-2:]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    m = masks.astype(jnp.float32)
    any_mask = m.sum(axis=(-1, -2)) > 0
    x_proj = m.max(axis=-2)  # (..., W)
    y_proj = m.max(axis=-1)  # (..., H)
    x_max = (x_proj * xs).max(axis=-1)
    x_min = jnp.where(x_proj > 0, x_proj * xs + (1 - x_proj) * 1e8, 1e8).min(axis=-1)
    y_max = (y_proj * ys).max(axis=-1)
    y_min = jnp.where(y_proj > 0, y_proj * ys + (1 - y_proj) * 1e8, 1e8).min(axis=-1)
    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_mask[..., None], boxes, 0.0)
