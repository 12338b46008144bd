"""Fused (shifted-)window attention for Video-Swin — Pallas TPU kernel
(the compute of reference models/video_swin_transformer.py:138-169,
WindowAttention3D.forward, as one VMEM-resident kernel).

The backbone's hottest non-matmul cost is materializing the per-window
attention matrices in HBM (stage 1: ~299 windows x 3 heads x 392x392). This
kernel keeps the whole per-(window, head) attention in VMEM:
qk^T -> +relative-position bias -> +shift mask -> softmax(f32) -> @v,
one HBM round-trip for q/k/v/out only.

Supported ops only (no in-kernel gathers — Mosaic's dynamic_gather crashes
this toolchain): matmuls, elementwise, static slices.

API mirrors the XLA path in models/video_swin.py; `window_attention` picks the
kernel on TPU and falls back to the XLA composition elsewhere.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def window_attention_xla(
    q: jnp.ndarray,  # (B_, H, N, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (H, N, N)
    mask: Optional[jnp.ndarray] = None,  # (nW, N, N) additive; B_ % nW == 0
) -> jnp.ndarray:
    B_, H, N, Dh = q.shape
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * (Dh ** -0.5), k)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, H, N, N) + mask[None, :, None].astype(
            attn.dtype
        )
        attn = attn.reshape(B_, H, N, N)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    # blocks: q/k/v (1, 1, N, Dh); bias (1, N, N); mask (1, N, N)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    Dh = q.shape[-1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (Dh ** -0.5)
    s = s + bias_ref[0].astype(jnp.float32)
    s = s + mask_ref[0].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_attention_pallas(
    q: jnp.ndarray,  # (B_, H, N, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (H, N, N)
    mask: Optional[jnp.ndarray] = None,  # (nW, N, N); B_ % nW == 0
    interpret: bool = False,
) -> jnp.ndarray:
    B_, H, N, Dh = q.shape
    if mask is None:
        mask = jnp.zeros((1, N, N), q.dtype)
    nW = mask.shape[0]

    grid = (B_, H)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N), lambda b, h: (b % nW, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, H, N, Dh), q.dtype),
        interpret=interpret,
    )(q, k, v, bias, mask)


def window_attention(q, k, v, bias, mask=None, impl: str = "xla",
                     interpret: bool = False):
    if impl == "pallas":
        try:
            return window_attention_pallas(q, k, v, bias, mask,
                                           interpret=interpret)
        except Exception:
            pass
    return window_attention_xla(q, k, v, bias, mask)
