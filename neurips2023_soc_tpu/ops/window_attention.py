"""Fused (shifted-)window attention for Video-Swin — Pallas TPU kernel
(the compute of reference models/video_swin_transformer.py:138-169,
WindowAttention3D.forward, as one VMEM-resident kernel).

The backbone's hottest non-matmul cost is materializing the per-window
attention matrices in HBM (e.g. swin-b stage 3 at 360x640/T=16: 48 windows
x 16 heads x 392x392 f32, ~3.5 HBM passes per block, x18 blocks). This
kernel keeps the whole per-(window, head) attention in VMEM: qk^T ->
+relative-position bias -> +shift-region mask -> softmax(f32) -> @v, one HBM
round-trip for q/k/v/out only.

v2 design notes (the v1 kernel measured SLOWER than XLA end-to-end, 44.0 vs
49.3 fps at swin-b — because its grid iterated heads innermost and indexed
the (H, N, N) bias per step, re-fetching ~614 KB of bias + mask from HBM for
every (window, head), dwarfing the ~100 KB of q/k/v/o it actually needed):

- grid is (H, B_/Wb) with the window-block dim INNERMOST, so the bias block
  index is constant along the inner loop and Mosaic fetches bias only H
  times total;
- the (nW, N, N) shift mask is never materialized: the kernel rebuilds it
  in VMEM from the compact per-token region labels (reference
  compute_mask's `img` labels, models/video_swin_transformer.py:316-329)
  shipped as two tiny f32 layouts (row vector + column vector), and the
  additive -100 mask is a broadcast compare;
- Wb windows are processed per grid step (static unrolled loop) to amortize
  grid sequencing overhead; B_ pads to a Wb multiple (padded windows compute
  garbage that is sliced off, matching the zero-cost of XLA's own padding).

Supported ops only (no in-kernel gathers — Mosaic's dynamic gather crashes
this toolchain; see ops/pallas_msda.py for the catalog of traps).

API mirrors the XLA path in models/video_swin.py; `window_attention` picks
the kernel on TPU when region ids are available and falls back to the XLA
composition elsewhere.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mask_from_ids(ids: jnp.ndarray) -> jnp.ndarray:
    """(nW, N) int region labels -> (nW, N, N) additive 0/-100 mask
    (reference models/video_swin_transformer.py:326-329)."""
    neq = ids[:, None, :] != ids[:, :, None]
    return jnp.where(neq, -100.0, 0.0).astype(jnp.float32)


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


def _attend_one(q, k, v, bias, mask_add, out_dtype):
    """One window-head: q/k/v (N, Dh); bias, mask_add (N, N) f32 or None."""
    Dh = q.shape[-1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (Dh ** -0.5)
    s = s + bias
    if mask_add is not None:
        s = s + mask_add
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, idr_ref, idc_ref, o_ref, *, Wb):
    # q/k/v/o: (Wb, 1, N, Dh); bias: (1, N, N); idr: (Wb, N, 1); idc: (Wb, 1, N)
    bias = bias_ref[0].astype(jnp.float32)
    for i in range(Wb):
        neq = idr_ref[i] != idc_ref[i]  # (N, 1) vs (1, N) -> (N, N)
        mask_add = jnp.where(neq, -100.0, 0.0)
        o_ref[i, 0] = _attend_one(
            q_ref[i, 0], k_ref[i, 0], v_ref[i, 0], bias, mask_add, o_ref.dtype
        )


def _kernel_nomask(q_ref, k_ref, v_ref, bias_ref, o_ref, *, Wb):
    bias = bias_ref[0].astype(jnp.float32)
    for i in range(Wb):
        o_ref[i, 0] = _attend_one(
            q_ref[i, 0], k_ref[i, 0], v_ref[i, 0], bias, None, o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_attention_pallas(
    q: jnp.ndarray,  # (B_, H, N, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (H, N, N)
    ids: Optional[jnp.ndarray] = None,  # (nW, N) int region labels; B_ % nW == 0
    interpret: bool = False,
) -> jnp.ndarray:
    B_, H, N, Dh = q.shape
    bias = bias.astype(jnp.float32)

    Wb = max(w for w in (1, 2, 4, 8) if w <= B_)
    pad = (-B_) % Wb
    B_p = B_ + pad
    if pad:
        zpad = [(0, pad)] + [(0, 0)] * 3
        q, k, v = (jnp.pad(t, zpad) for t in (q, k, v))

    qkv_spec = pl.BlockSpec((Wb, 1, N, Dh), lambda h, b: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda h, b: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    grid = (H, B_p // Wb)  # window blocks innermost: bias fetched H times

    if ids is not None:
        nW = ids.shape[0]
        ids_full = jnp.tile(ids.astype(jnp.float32), (B_ // nW, 1))
        ids_full = jnp.pad(ids_full, ((0, pad), (0, 0)))
        idr = ids_full[:, :, None]  # (B_p, N, 1) row labels
        idc = ids_full[:, None, :]  # (B_p, 1, N) column labels
        out = pl.pallas_call(
            functools.partial(_kernel_masked, Wb=Wb),
            grid=grid,
            in_specs=[
                qkv_spec, qkv_spec, qkv_spec, bias_spec,
                pl.BlockSpec((Wb, N, 1), lambda h, b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wb, 1, N), lambda h, b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct((B_p, H, N, Dh), q.dtype),
            interpret=interpret,
        )(q, k, v, bias, idr, idc)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_nomask, Wb=Wb),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct((B_p, H, N, Dh), q.dtype),
            interpret=interpret,
        )(q, k, v, bias)
    return out[:B_]


def window_attention(q, k, v, bias, mask=None, ids=None, impl: str = "xla",
                     interpret: bool = False):
    """mask: materialized (nW, N, N) additive mask (XLA path); ids: compact
    (nW, N) region labels (Pallas path — the kernel rebuilds the mask in
    VMEM). Callers pass ids for impl='pallas' and may omit mask; the XLA
    fallback derives it."""
    if impl == "pallas" and (mask is None or ids is not None):
        try:
            return window_attention_pallas(q, k, v, bias, ids,
                                           interpret=interpret)
        except Exception:
            pass
    if mask is None and ids is not None:
        mask = mask_from_ids(ids)
    return window_attention_xla(q, k, v, bias, mask)
