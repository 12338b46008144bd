"""Mask losses (reference models/segmentation.py:80-149), static-shape jnp."""
from __future__ import annotations

import jax.numpy as jnp


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray, num_masks,
              weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """inputs/targets: (N, P) logits/binary. weight: (N,) 0/1 validity."""
    probs = jnp.clip(jnp.asarray(inputs, jnp.float32), -30, 30)
    probs = 1.0 / (1.0 + jnp.exp(-probs))
    targets = targets.astype(jnp.float32)
    numerator = 2.0 * (probs * targets).sum(-1)
    denominator = probs.sum(-1) + targets.sum(-1)
    loss = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    if weight is not None:
        loss = loss * weight
    return loss.sum() / num_masks


def sigmoid_focal_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    num_masks,
    alpha: float = 0.25,
    gamma: float = 2.0,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """inputs: (N, P) logits; mean over P, weighted sum over N, / num_masks."""
    x = jnp.asarray(inputs, jnp.float32)
    t = targets.astype(jnp.float32)
    p = 1.0 / (1.0 + jnp.exp(-jnp.clip(x, -30, 30)))
    ce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * t + (1 - p) * (1 - t)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * t + (1 - alpha) * (1 - t)) * loss
    loss = loss.mean(axis=tuple(range(1, loss.ndim)))
    if weight is not None:
        loss = loss * weight
    return loss.sum() / num_masks
