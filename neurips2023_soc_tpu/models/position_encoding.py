"""Sine positional encodings, pad-mask aware (reference
models/position_encoding.py:11-82). Channels-last: 2D returns (B, H, W, C),
1D returns (B, S, C)."""
from __future__ import annotations

import math

import jax.numpy as jnp


def _dim_t(num_pos_feats: int, temperature: float) -> jnp.ndarray:
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    return temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(pos[..., 0::2]), cos(pos[..., 1::2])) flattened — torch order."""
    s = jnp.sin(pos[..., 0::2])
    c = jnp.cos(pos[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(*pos.shape[:-1], -1)


def position_embedding_sine_1d(
    pad_mask: jnp.ndarray,  # (B, S) True on padding
    num_pos_feats: int = 256,
    temperature: float = 10000.0,
    normalize: bool = True,
) -> jnp.ndarray:
    not_mask = (~pad_mask).astype(jnp.float32)
    x_embed = jnp.cumsum(not_mask, axis=1)
    if normalize:
        eps = 1e-6
        x_embed = x_embed / (x_embed[:, -1:] + eps) * (2 * math.pi)
    pos_x = x_embed[:, :, None] / _dim_t(num_pos_feats, temperature)
    return _interleave_sin_cos(pos_x)  # (B, S, C)


def position_embedding_sine_2d(
    pad_mask: jnp.ndarray,  # (B, H, W) True on padding
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
) -> jnp.ndarray:
    not_mask = (~pad_mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * (2 * math.pi)
        x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * (2 * math.pi)
    dim_t = _dim_t(num_pos_feats, temperature)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)  # (B, H, W, 2*num_pos_feats)
