"""Multi-scale deformable attention — the TPU-native replacement for the
reference's CUDA extension (reference models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238,
python oracle at models/ops/functions/ms_deform_attn_func.py:41-61).

Semantics: for every (batch, query, head), sample `P` bilinear points from each
of `L` flattened feature levels at `sampling_locations` (normalized [0,1] xy,
zero padding outside, grid_sample align_corners=False convention) and reduce
with softmaxed `attention_weights`.

Two implementations behind one API:

* `impl='pallas'` (ops/pallas_msda.py) — the TPU default for BOTH forward and
  backward: an in-VMEM forward kernel (tile-major query permutation, bf16
  int32-packed patch table) plus a backward kernel that replaces the
  reference's six CUDA col2im variants with a one-hot MXU matmul scatter.
  It is SPMD-partitionable (`jax.custom_partitioning` over batch/query) and
  therefore serves single-chip inference AND sharded training.
* this module's XLA path (`impl='xla'`) — patch-table flat gathers (see
  ms_deform_attn_xla docstring; TPU gathers are row-rate-bound, so each
  sample reads ONE (4*D)-wide row holding its whole 2x2 bilinear
  neighborhood), gradients from autodiff (the value gradient lowers to
  scatter-add) under `jax.checkpoint`. It remains the numerical oracle for
  kernel tests and the CPU implementation.

`impl='auto'` (the model default) picks Pallas on TPU except for
sparse-query calls (the decoder's Nq=20 queries over ~15k value rows), which
measure faster on the XLA gather path (12.2 vs 2.1 ms — BENCH_NOTES.md).

Shapes (channels-last, head-major):
  value:               (B, S, M, D)   S = sum(H_l*W_l)
  spatial_shapes:      static tuple ((H_0,W_0), ..., (H_{L-1},W_{L-1}))
  sampling_locations:  (B, Lq, M, L, P, 2)  xy in [0,1]
  attention_weights:   (B, Lq, M, L, P)     softmax over (L,P)
  returns:             (B, Lq, M*D)
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

SpatialShapes = Tuple[Tuple[int, int], ...]


def level_start_index(spatial_shapes: SpatialShapes) -> Tuple[int, ...]:
    starts, cur = [], 0
    for h, w in spatial_shapes:
        starts.append(cur)
        cur += h * w
    return tuple(starts)


def bilinear_anchors(x: jnp.ndarray, y: jnp.ndarray, H: int, W: int):
    """floor/frac/clip decisions for the 2x2 patch anchor, shared by the XLA
    path and the Pallas kernel so both make bit-identical f32 decisions.
    Returns (ax, ay, fx, fy, x0i, y0i)."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    ax = jnp.clip(x0i, 0, max(W - 2, 0))
    ay = jnp.clip(y0i, 0, max(H - 2, 0))
    return ax, ay, fx, fy, x0i, y0i


def slot_weight_pair(f: jnp.ndarray, a: jnp.ndarray, q0: jnp.ndarray,
                     size: int):
    """(w0, w1): bilinear weights of the two patch slots along one axis —
    the single source of truth for both the XLA path and the Pallas kernel.

    q0 = floor(coord) (int), f = frac, a = clip(q0, 0, size-2) anchor.
    slot k holds coordinate a+k; its weight is (1-f) if a+k == q0, f if
    a+k == q0+1, else 0 — this reproduces bilinear-with-zero-padding exactly
    for every clipping case (q0 < 0, q0 == size-1, far out of range).

    size == 1 degenerate axis: the anchor clips to 0 so slot 1 sits at
    coordinate 1, OUT of bounds — grid_sample zero-pads there, but the rolled
    patch table wraps into the next row/level, so its weight must be forced
    to zero (static branch: `size` is a compile-time level dimension).
    """
    w = []
    for k in (0, 1):
        qq = a + k
        wk = jnp.where(qq == q0, 1.0 - f, jnp.where(qq == q0 + 1, f, 0.0))
        if k == 1 and size == 1:
            wk = jnp.zeros_like(wk)
        w.append(wk)
    return w[0], w[1]


def _slot_weights(q: jnp.ndarray, f: jnp.ndarray, a: jnp.ndarray,
                  q0: jnp.ndarray, size: int) -> jnp.ndarray:
    w0, w1 = slot_weight_pair(f, a, q0, size)
    return jnp.stack([w0, w1], axis=-1)  # (..., 2)


def slot_weight_grad_pair(a: jnp.ndarray, q0: jnp.ndarray, size: int):
    """(dw0/dcoord, dw1/dcoord): analytic derivative of `slot_weight_pair`
    w.r.t. the un-normalized sampling coordinate (f = coord - floor(coord),
    df/dcoord = 1 a.e.; floor contributes zero a.e.) — the piecewise-constant
    selectors match what autodiff of the `where` chain produces, so the
    Pallas backward kernel and the XLA-autodiff backward agree exactly."""
    grads = []
    for k in (0, 1):
        qq = a + k
        gk = jnp.where(qq == q0, -1.0, jnp.where(qq == q0 + 1, 1.0, 0.0))
        if k == 1 and size == 1:
            gk = jnp.zeros_like(gk)
        grads.append(gk)
    return grads[0], grads[1]


def ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Pure-XLA implementation via patch-table gathers.

    TPU gathers are row-rate-bound (~160M rows/s on v5e regardless of row
    width), so instead of gathering 4 bilinear corners per sample we build a
    per-level patch table whose row s holds the 2x2 neighborhood
    [v[s], v[s+1], v[s+W], v[s+W+1]] and gather ONE (4*D)-wide row per
    (batch, query, head, level, point) — 4x fewer rows than the naive
    flat-gather and >700x the original batched take_along_axis lowering.
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    starts = level_start_index(spatial_shapes)
    LP = L * P

    loc = sampling_locations.astype(jnp.float32)
    attn = attention_weights.astype(jnp.float32)

    vh = jnp.transpose(value, (0, 2, 1, 3))  # (B, M, S, D)

    def build_table(vh_chunk):
        """Patch table (b, M, S, 4D) -> flat (b*M*S, 4D); row s holds the 2x2
        neighborhood. Rolls stay within each level's row range."""
        level_tables = []
        for l, (H, W) in enumerate(spatial_shapes):
            v_l = jax.lax.dynamic_slice_in_dim(vh_chunk, starts[l], H * W, axis=2)
            level_tables.append(
                jnp.concatenate(
                    [
                        v_l,
                        jnp.roll(v_l, -1, axis=2),
                        jnp.roll(v_l, -W, axis=2),
                        jnp.roll(v_l, -(W + 1), axis=2),
                    ],
                    axis=-1,
                )
            )
        t = jnp.concatenate(level_tables, axis=2)
        return t.reshape(-1, 4 * D)

    # anchors + per-slot weights per level
    anchor_levels, w_levels = [], []
    for l, (H, W) in enumerate(spatial_shapes):
        x = loc[:, :, :, l, :, 0] * W - 0.5  # (B, Lq, M, P)
        y = loc[:, :, :, l, :, 1] * H - 0.5
        ax, ay, fx, fy, x0i, y0i = bilinear_anchors(x, y, H, W)
        anchor_levels.append(ay * W + ax + starts[l])
        wx = _slot_weights(x, fx, ax, x0i, W)  # (B, Lq, M, P, 2)
        wy = _slot_weights(y, fy, ay, y0i, H)
        # slot order matches the table concat: (y0,x0),(y0,x1),(y1,x0),(y1,x1)
        ws = wy[..., :, None] * wx[..., None, :]  # (B, Lq, M, P, 2, 2)
        ws = ws.reshape(ws.shape[:-2] + (4,)) * attn[:, :, :, l, :, None]
        w_levels.append(ws)
    anchor = jnp.stack(anchor_levels, 3).reshape(B, Lq, M, LP)  # spatial idx
    # weights kept flat (..., LP*4): a trailing dim of 4 would tile-pad 32x
    w = jnp.stack(w_levels, 3).reshape(B, Lq, M, LP * 4)

    # XLA materializes the gathered tensor, so (a) keep its minor dim 4*D
    # (=128 for d_model 256) — reshaping to (..., 4, D) forces (8,128) tile
    # padding and a 4x memory/bandwidth blowup — and (b) chunk the batch axis:
    # it bounds both HBM for whole-video clips (T=32+ folded into B) AND the
    # per-gather table footprint (the v5e gather rate degrades ~3x once the
    # table outgrows ~300 MB, measured at B=16 vs B=8).
    rows_per_b = Lq * M * LP
    chunk_b = max(1, min(B, (2 << 20) // max(rows_per_b, 1)))
    outs = []
    for b0 in range(0, B, chunk_b):
        b1 = min(b0 + chunk_b, B)
        nb = b1 - b0
        table = build_table(vh[b0:b1])  # (nb*M*S, 4D)
        bm = (
            jnp.arange(nb, dtype=jnp.int32)[:, None, None, None] * M
            + jnp.arange(M, dtype=jnp.int32)[None, None, :, None]
        )
        rows = (anchor[b0:b1] + bm * S).reshape(-1)
        g = jnp.take(table, rows, axis=0)  # (nb*Lq*M*LP, 4D)
        g = g.reshape(b1 - b0, Lq, M, LP * 4 * D)
        # per-(lp, slot) weights widened to their D channel columns (slot
        # blocks are contiguous in the patch table); product in the value
        # dtype, f32 accumulation over both lp and slot
        w_wide = jnp.repeat(w[b0:b1], D, axis=-1).astype(g.dtype)
        prod = (g * w_wide).astype(jnp.float32)
        outs.append(prod.reshape(b1 - b0, Lq, M, LP * 4, D).sum(3))
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return out.reshape(B, Lq, M * D).astype(value.dtype)


def resolve_msda_impl(impl: str, num_queries: int, num_tokens: int,
                      backend: str) -> str:
    """Resolve impl='auto' to 'pallas' or 'xla'.

    The Pallas kernel wins ~25% end-to-end on TPU (BENCH_NOTES.md) and is
    SPMD batch-partitionable (pallas_msda._spmd_pallas_forward), so
    dense-query TPU calls use it — single chip or multi-device pjit (the
    round-2 device_count==1 gate also mis-fired on single-device jits on
    multi-chip hosts, ADVICE r2). Only TPU backends can lower the Mosaic
    kernel ("axon" is the tunneled TPU plugin on this image); GPU/CPU fall
    back to XLA, which is both the oracle and the faster interpreter there.

    Query-sparsity heuristic (round 3, measured on v5e at the flagship
    pyramid, B=16): the kernel's cost has a large Lq-independent term (the
    in-VMEM patch-table build over all S tokens), so at the DECODER shape
    (Lq=20 object queries vs S=4820) it costs 12.2 ms where the XLA gather
    path costs 2.1 ms; at the ENCODER shape (Lq == S) the kernel wins ~2x.
    Route sparse-query calls (object queries) to XLA and dense ones
    (encoder self-attention) to the kernel — worth ~30 ms/clip at T=16
    (3 decoder layers)."""
    if impl != "auto":
        return impl
    on_tpu = backend in ("tpu", "axon")
    dense_queries = 4 * num_queries >= num_tokens
    return "pallas" if (on_tpu and dense_queries) else "xla"


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "impl"))
def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "xla",
) -> jnp.ndarray:
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    impl = resolve_msda_impl(
        impl, sampling_locations.shape[1],
        sum(h * w for h, w in spatial_shapes), jax.default_backend())
    if impl == "pallas":
        from .pallas_msda import ms_deform_attn_pallas_op

        return ms_deform_attn_pallas_op(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    # remat: recompute the gather in the backward pass instead of saving the
    # multi-GB gathered tensor as a residual (the analog of the reference's
    # custom Function not saving im2col buffers)
    fn = jax.checkpoint(ms_deform_attn_xla, static_argnums=(1,))
    return fn(value, spatial_shapes, sampling_locations, attention_weights)
