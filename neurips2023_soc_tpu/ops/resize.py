"""Torch-exact image resizing primitives, implemented as vectorized gathers.

The reference pipeline's mAP is sensitive to the exact interpolation index
math (SURVEY.md §7 "hard parts"): `F.interpolate(mode='nearest')`,
`mode='bilinear'` with both align_corners settings, and the CondInst
`aligned_bilinear` upsample (reference models/soc.py:511-533). jax.image.resize
uses different sample-position conventions, so we implement the torch ones
directly. Everything here is shape-static and jit/grad friendly.

Layout: channels-last, (..., H, W, C). Leading dims are free.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _out_coords_nearest(out_size: int, in_size: int) -> jnp.ndarray:
    # torch 'nearest': src = floor(dst * in / out)
    idx = jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size)
    return jnp.clip(idx.astype(jnp.int32), 0, in_size - 1)


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Exact equivalent of F.interpolate(x, size, mode='nearest').

    x: (..., H, W, C) -> (..., out_h, out_w, C)
    """
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    iy = _out_coords_nearest(out_h, h)
    ix = _out_coords_nearest(out_w, w)
    x = jnp.take(x, iy, axis=-3)
    x = jnp.take(x, ix, axis=-2)
    return x


def _src_index_weight(out_size: int, in_size: int, align_corners: bool):
    """Source sample positions for 1-D linear interpolation, torch semantics."""
    dst = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros_like(dst)
        else:
            src = dst * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = jnp.maximum((dst + 0.5) * scale - 0.5, 0.0)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    frac = src - i0.astype(jnp.float32)
    return i0, i1, frac


def resize_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Exact equivalent of F.interpolate(x, size, mode='bilinear').

    x: (..., H, W, C) -> (..., out_h, out_w, C). Interpolation is computed in
    float32 and cast back to the input dtype.
    """
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    y0, y1, fy = _src_index_weight(out_h, h, align_corners)
    x0, x1, fx = _src_index_weight(out_w, w, align_corners)

    top = jnp.take(xf, y0, axis=-3)
    bot = jnp.take(xf, y1, axis=-3)
    fy = fy.reshape((out_h,) + (1,) * 2)
    rows = top * (1.0 - fy) + bot * fy  # (..., out_h, W, C)
    left = jnp.take(rows, x0, axis=-2)
    right = jnp.take(rows, x1, axis=-2)
    fx = fx.reshape((out_w, 1))
    out = left * (1.0 - fx) + right * fx
    return out.astype(dtype)


def aligned_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """CondInst's aligned upsample (reference models/soc.py:511-533).

    x: (..., H, W, C). Replicate-pad bottom/right by 1, bilinear-resize
    (align_corners=True) to (f*H+1, f*W+1), replicate-pad top/left by f//2,
    crop to (f*H, f*W).
    """
    assert factor >= 1 and int(factor) == factor
    if factor == 1:
        return x
    h, w = x.shape[-3], x.shape[-2]
    nb = x.ndim - 3
    pad_rb = [(0, 0)] * nb + [(0, 1), (0, 1), (0, 0)]
    x = jnp.pad(x, pad_rb, mode="edge")
    oh, ow = factor * h + 1, factor * w + 1
    x = resize_bilinear(x, oh, ow, align_corners=True)
    k = factor // 2
    pad_tl = [(0, 0)] * nb + [(k, 0), (k, 0), (0, 0)]
    x = jnp.pad(x, pad_tl, mode="edge")
    return x[..., : oh - 1, : ow - 1, :]


@functools.partial(jax.jit, static_argnums=(1, 2))
def downsample_mask_nearest(mask: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Pad-mask downsampling to a feature resolution.

    Matches `F.interpolate(mask[None].float(), size).to(bool)` from the
    reference (models/video_swin_transformer.py:714): nearest resampling of a
    boolean mask. mask: (..., H, W) bool.
    """
    m = resize_nearest(mask[..., None].astype(jnp.float32), out_h, out_w)
    return m[..., 0] > 0.5
