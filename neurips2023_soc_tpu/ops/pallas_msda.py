"""Pallas TPU kernel for multi-scale deformable attention.

The TPU-native replacement for the reference's CUDA `ms_deform_im2col`
(reference models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238; python oracle at
models/ops/functions/ms_deform_attn_func.py:41-61). Semantics identical to
`ms_deform_attn_xla` (ops/ms_deform_attn.py): bilinear zero-padding sampling
of L flattened levels at per-(query, head) locations, reduced with the given
attention weights.

Why a kernel: the XLA path lowers each sample to a one-row HBM gather and the
v5e sustains only ~160M gather-rows/s — the SOC encoder is bound by it
(~60 ms/layer at 360x640, T=16). Mosaic cannot lower a large dynamic gather
either (its backend crashes for gathers wider than one 128-lane register or
on sub-32-bit dtypes), so this kernel reformulates the sample as an
*in-register* lane gather:

  * per level, a patch-table row holds the whole 2x2 bilinear neighborhood
    [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)] (4*D channels), so one gathered
    lane resolves one sample;
  * the table is re-tiled into spatial 8x16 tiles and transposed to
    (tile, channels, 128): channels on sublanes, the tile's 128 anchor
    positions on lanes — `jnp.take_along_axis(tile, idx, axis=1)` is the one
    dynamic-gather shape Mosaic compiles (32-bit, 128 lanes);
  * bf16 values are packed two-channels-per-int32 (even channel in the low
    half: Mosaic's `bitcast` un-packs int32 sublane r into bf16 sublanes
    2r/2r+1, restoring channel order), halving gather work and table traffic;
    the tile-selection mask is applied with an int32 `where` — exact, since
    selection never rounds — and one bitcast per sample group recovers bf16;
  * queries are statically permuted into the same tile-major order, so the
    128 queries of a block are spatially compact and their p-th samples land
    in very few tiles (deformable offsets are local in practice); the kernel
    loops over each block's actual 2D tile bounding box

        for ty, tx in [tymin..tymax] x [txmin..txmax]:
            part += where(sample_tile == (ty, tx), gather(tile, lane), 0)

    which is *exact* for arbitrary offsets — spread-out samples just visit
    more tiles;
  * anchor/lane indices and bilinear slot weights are derived from the raw
    sampling coordinates *inside* the kernel (vectorized over all blocks of
    a grid step), so the XLA side only transposes coordinates into
    (B*M, L, P, Lq) layout and reduces per-block tile bounds into SMEM — no
    multi-hundred-MB index or weight tensors are materialized.

Kernel-layout glossary:
  table  (B*M, NT, 4*D, 128) f32 — or (B*M, NT, 2*D, 128) i32 when packed;
         NT = sum_l ceil(H_l/8) * ceil(W_l/16)
  locx/locy/att (B*M, L, P, NQB, 128) f32   tile-major-permuted, edge-padded
  bounds (B*M, L, P, NQB, 4) i32  [tymin, tynum, txmin, txnum] per block
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SpatialShapes = Tuple[Tuple[int, int], ...]

TY, TX = 8, 16  # spatial tile: 8 rows x 16 cols = 128 lanes
LANES = TY * TX


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _level_geoms(spatial_shapes: SpatialShapes):
    """[(H, W, nty, ntx, tile_base)] and the total tile count."""
    geoms, base = [], 0
    for h, w in spatial_shapes:
        nty, ntx = _cdiv(h, TY), _cdiv(w, TX)
        geoms.append((h, w, nty, ntx, base))
        base += nty * ntx
    return geoms, base


@functools.lru_cache(maxsize=None)
def _tile_major_perm(spatial_shapes: SpatialShapes):
    """Static query permutation: each level's queries sorted by (tile, lane),
    then padded (by repeating the level's last query) to a 128 multiple so no
    query block straddles two levels — a straddling block's samples would
    span a whole level and defeat the kernel's tile-locality fast path.

    Returns (perm, inv): perm has length sum_l ceil(S_l/128)*128 and indexes
    into the S real queries (with duplicates as padding); inv has length S
    and maps each real query to its (first) slot in the permuted order.
    """
    perm, inv = [], []
    start = 0
    for h, w, nty, ntx, _ in _level_geoms(spatial_shapes)[0]:
        y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        key = ((y // TY) * ntx + x // TX) * LANES + (y % TY) * TX + x % TX
        p = np.argsort(key.ravel(), kind="stable")
        ip = np.empty_like(p)
        ip[p] = np.arange(h * w)
        inv.append(ip + sum(len(q) for q in perm))
        pad = _cdiv(h * w, LANES) * LANES - h * w
        p = np.concatenate([p, np.full(pad, p[-1])])
        perm.append(p + start)
        start += h * w
    perm = np.concatenate(perm)
    inv = np.concatenate(inv)
    # numpy (not jnp): results are lru_cached and must not capture a trace
    return perm.astype(np.int32), inv.astype(np.int32)


def _build_tables(value: jnp.ndarray, spatial_shapes: SpatialShapes,
                  packed: bool, bf16_unpacked: bool = False):
    """(B, S, M, D) -> tiled transposed patch tables.

    Row s of a level's patch table is the 2x2 neighborhood of anchor s
    (rolls stay within the level, and anchors are clipped to [0, W-2] /
    [0, H-2] so wrapped rows are never addressed with nonzero weight).
    Returns (B*M, NT, 4D, LANES) f32, or (B*M, NT, 2D, LANES) int32 holding
    bf16 channel pairs (even channel in the low 16 bits) when `packed`.
    """
    B, S, M, D = value.shape
    geoms, _ = _level_geoms(spatial_shapes)
    dt = jnp.bfloat16 if (packed or bf16_unpacked) else jnp.float32
    vh = jnp.transpose(value, (0, 2, 1, 3)).astype(dt)  # (B,M,S,D)
    start = 0
    tables = []
    for (H, W, nty, ntx, _) in geoms:
        v = jax.lax.dynamic_slice_in_dim(vh, start, H * W, axis=2)
        start += H * W
        t = jnp.concatenate(
            [v, jnp.roll(v, -1, 2), jnp.roll(v, -W, 2), jnp.roll(v, -(W + 1), 2)],
            axis=-1,
        )  # (B, M, H*W, 4D)
        C = 4 * D
        if packed:
            u = jax.lax.bitcast_convert_type(t, jnp.uint16).astype(jnp.uint32)
            t = (u[..., 0::2] | (u[..., 1::2] << 16)).astype(jnp.int32)
            C = 2 * D
        t = t.reshape(B, M, H, W, C)
        t = jnp.pad(t, ((0, 0), (0, 0), (0, nty * TY - H), (0, ntx * TX - W), (0, 0)))
        t = t.reshape(B, M, nty, TY, ntx, TX, C)
        t = jnp.transpose(t, (0, 1, 2, 4, 6, 3, 5))  # (B,M,nty,ntx,C,TY,TX)
        tables.append(t.reshape(B * M, nty * ntx, C, LANES))
    return jnp.concatenate(tables, axis=1)


# single source of truth with the XLA path: both implementations must make
# bit-identical f32 floor/clip/weight decisions (the backward kernel and the
# XLA-autodiff fallback must agree exactly); duplicating this math already
# caused one fix (the size-1 degenerate-axis slot) to need applying twice.
from .ms_deform_attn import bilinear_anchors as _anchors  # noqa: E402
from .ms_deform_attn import slot_weight_grad_pair as _slot_g  # noqa: E402
from .ms_deform_attn import slot_weight_pair as _slot_w  # noqa: E402


@functools.lru_cache(maxsize=None)
def _perm_cotangent_maps(spatial_shapes: SpatialShapes):
    """(src, first): static maps to spread an output cotangent into the
    PADDED tile-major layout. src[i] = the real query whose data occupies
    permuted slot i; first[i] = 1.0 iff slot i is that query's canonical
    slot (perm pads by REPEATING each level's last query, so without the
    mask a duplicated slot would double-count its cotangent into d_table)."""
    perm, inv = _tile_major_perm(spatial_shapes)
    first = (inv[perm] == np.arange(len(perm))).astype(np.float32)
    return perm, first


def _transpose_inputs(sampling_locations, attention_weights, spatial_shapes,
                      nqb, permute=None):
    """Permuted coords/weights into kernel layout + per-block tile bounds."""
    B, Lq, M, L, P, _ = sampling_locations.shape
    geoms, _ = _level_geoms(spatial_shapes)
    loc = sampling_locations.astype(jnp.float32)
    att = attention_weights.astype(jnp.float32)
    if permute is None:
        permute = Lq == sum(h * w for h, w, *_ in geoms)
    if permute:
        # encoder self-attention: queries ARE the level positions — reorder
        # them tile-major so each 128-query block is spatially compact.
        # Flatten trailing dims first: a plain 2D row gather keeps XLA from
        # fusing the take into a transposed layout that overflows VMEM.
        perm, _ = _tile_major_perm(spatial_shapes)
        loc = jnp.take(loc.reshape(B, Lq, -1), perm, axis=1).reshape(
            B, len(perm), M, L, P, 2)
        att = jnp.take(att.reshape(B, Lq, -1), perm, axis=1).reshape(
            B, len(perm), M, L, P)
    lqw = loc.shape[1]

    def to_kernel(a):  # (B, lqw, M, L, P) -> (BM, L, P, nqb, 128) edge-padded
        a = jnp.transpose(a, (0, 2, 3, 4, 1)).reshape(B * M, L, P, lqw)
        a = jnp.pad(a, ((0, 0),) * 3 + ((0, nqb * LANES - lqw),), mode="edge")
        return a.reshape(B * M, L, P, nqb, LANES)

    locx = to_kernel(loc[..., 0])
    locy = to_kernel(loc[..., 1])
    attk = to_kernel(att)

    bounds_l = []
    for l, (H, W, nty, ntx, _) in enumerate(geoms):
        x = locx[:, l] * W - 0.5  # (BM, P, nqb, 128)
        y = locy[:, l] * H - 0.5
        ax, ay, *_ = _anchors(x, y, H, W)
        ty, tx = ay // TY, ax // TX
        bounds_l.append(jnp.stack(
            [ty.min(-1), ty.max(-1) - ty.min(-1) + 1,
             tx.min(-1), tx.max(-1) - tx.min(-1) + 1], axis=-1))
    bounds = jnp.stack(bounds_l, 1).astype(jnp.int32)  # (BM, L, P, nqb, 4)
    return locx, locy, attk, bounds


def _union_bbox(bounds_ref, l: int, qa, P: int):
    """Union tile bounding box over a level's P sampling points — shared by
    the forward and backward fused-points paths, which must visit identical
    tile sets. Returns (uy0, uy1, ux0, ux1) scalars (exclusive maxima)."""
    uy0 = bounds_ref[0, l, 0, qa, 0]
    uy1 = uy0 + bounds_ref[0, l, 0, qa, 1]
    ux0 = bounds_ref[0, l, 0, qa, 2]
    ux1 = ux0 + bounds_ref[0, l, 0, qa, 3]
    for p in range(1, P):
        y0 = bounds_ref[0, l, p, qa, 0]
        x0 = bounds_ref[0, l, p, qa, 2]
        uy0 = jnp.minimum(uy0, y0)
        uy1 = jnp.maximum(uy1, y0 + bounds_ref[0, l, p, qa, 1])
        ux0 = jnp.minimum(ux0, x0)
        ux1 = jnp.maximum(ux1, x0 + bounds_ref[0, l, p, qa, 3])
    return uy0, uy1, ux0, ux1


def _make_kernel(geoms, L: int, P: int, D: int, qpb: int, packed: bool,
                 mxu: bool = False, fuse_points: bool = False):
    """mxu=True replaces the per-tile lane gather with a one-hot MXU matmul:
    part[4D, q] = tile[4D, lane] @ onehot[lane, q]. The onehot is exact
    (0/1), so precision equals the gather path; the win is moving the
    per-sample data movement from VPU shuffles onto the systolic array.

    fuse_points=True visits the UNION tile bounding box of a level's P
    sampling points in one loop (P gathers per visit) instead of P separate
    bounds-loops — 4x less scalar loop setup when the points' tight offsets
    land them in the same tiles, extra wasted gathers when they spread."""
    if mxu:
        packed = False  # mxu samples an unpacked (possibly bf16) table
    CR = 2 * D if packed else 4 * D  # gathered table rows per tile

    def kernel(bounds_ref, t_ref, locx_ref, locy_ref, att_ref, o_ref):
        qs = pl.program_id(1)
        zero = jnp.zeros((CR, LANES), jnp.int32 if packed else jnp.float32)
        if mxu:
            lane_rows = jax.lax.broadcasted_iota(
                jnp.int32, (LANES, LANES), 0)

        # anchor math vectorized over all qpb blocks of this grid step
        lov_a, tyv_a, txv_a, w4_a = [], [], [], []
        for l, (H, W, nty, ntx, base) in enumerate(geoms):
            for p in range(P):
                x = locx_ref[0, l, p] * W - 0.5  # (qpb, 128)
                y = locy_ref[0, l, p] * H - 0.5
                ax, ay, fx, fy, x0i, y0i = _anchors(x, y, H, W)
                tyv_a.append(ay // TY)
                txv_a.append(ax // TX)
                lov_a.append((ay % TY) * TX + ax % TX)
                wx0, wx1 = _slot_w(fx, ax, x0i, W)
                wy0, wy1 = _slot_w(fy, ay, y0i, H)
                aw = att_ref[0, l, p]
                w4 = jnp.stack(
                    [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], 1
                ) * aw[:, None]  # (qpb, 4, 128)
                w4_a.append(w4.astype(jnp.bfloat16) if packed else w4)

        for qb in range(qpb):  # static unroll: value indexing must be static
            qa = qs * qpb + qb
            acc = jnp.zeros((D, LANES), jnp.float32)
            if fuse_points and not mxu:
                for l, (H, W, nty, ntx, base) in enumerate(geoms):
                    uy0, uy1, ux0, ux1 = _union_bbox(bounds_ref, l, qa, P)
                    txn_u = ux1 - ux0
                    gs = [l * P + p for p in range(P)]
                    LOs = [jnp.broadcast_to(lov_a[g][qb][None], (CR, LANES))
                           for g in gs]
                    tyvs = [tyv_a[g][qb][None] for g in gs]
                    txvs = [txv_a[g][qb][None] for g in gs]

                    def vbody(k, accs, uy0=uy0, ux0=ux0, txn_u=txn_u,
                              ntx=ntx, base=base, LOs=LOs, tyvs=tyvs,
                              txvs=txvs):
                        ty = uy0 + k // txn_u
                        tx = ux0 + k % txn_u
                        tile = t_ref[0, base + ty * ntx + tx]  # read once
                        out = []
                        for p in range(P):
                            cand = jnp.take_along_axis(tile, LOs[p], axis=1)
                            m = (tyvs[p] == ty) & (txvs[p] == tx)
                            out.append(accs[p] + jnp.where(m, cand, zero))
                        return tuple(out)

                    parts = jax.lax.fori_loop(
                        0, (uy1 - uy0) * txn_u, vbody, (zero,) * P)
                    for p, part in enumerate(parts):
                        if packed:
                            part = pltpu.bitcast(part, jnp.bfloat16)
                        w4 = w4_a[gs[p]][qb]  # (4,128)
                        acc = acc + (part.reshape(4, D, LANES)
                                     * w4[:, None, :]).astype(
                                         jnp.float32).sum(0)
                o_ref[0, qb] = acc
                continue
            for g, (l, (H, W, nty, ntx, base)) in enumerate(
                    (l, geom) for l, geom in enumerate(geoms) for _ in range(P)):
                p = g % P
                tyv = tyv_a[g][qb][None]  # (1,128)
                txv = txv_a[g][qb][None]
                LO = jnp.broadcast_to(lov_a[g][qb][None], (CR, LANES))
                tym = bounds_ref[0, l, p, qa, 0]
                tyn = bounds_ref[0, l, p, qa, 1]
                txm = bounds_ref[0, l, p, qa, 2]
                txn = bounds_ref[0, l, p, qa, 3]

                # NOTE(perf, measured): a lax.cond fast path for 1x1 tile
                # bounding boxes (single gather, no select, no loop) was
                # tried and showed no e2e win (59.8 fps vs 58.6-62.4 for
                # this version across same-day runs — within the chip's
                # ±6% load-dependent spread); the per-group scalar branch
                # eats whatever the skipped mask/select saves.
                if mxu:
                    oh_full = lane_rows == lov_a[g][qb][None, :]  # (t, q)
                    zf = jnp.zeros((CR, LANES), jnp.float32)

                    def ybody(ky, a, tym=tym, txm=txm, txn=txn, ntx=ntx,
                              base=base, oh_full=oh_full, tyv=tyv, txv=txv):
                        ty = tym + ky

                        def xbody(kx, a):
                            tx = txm + kx
                            t = base + ty * ntx + tx
                            m = (tyv == ty) & (txv == tx)  # (1, q)
                            tile = t_ref[0, t]
                            # bool -> f32 -> table dtype (Mosaic has no
                            # direct i1 -> bf16 truncation)
                            oh = jnp.where(m & oh_full, 1.0,
                                           0.0).astype(tile.dtype)
                            return a + jax.lax.dot(
                                tile, oh,
                                preferred_element_type=jnp.float32)

                        return jax.lax.fori_loop(0, txn, xbody, a)

                    part = jax.lax.fori_loop(0, tyn, ybody, zf)
                else:
                    # Single linearized scalar loop over the tile bounding
                    # box. Interleaved same-process A/B vs the previous
                    # nested (ty, tx) loop pair at the flagship encoder
                    # shape: medians 27.7/26.9 ms (linear) vs 30.1/28.0
                    # (nested), mins equal (27.4/26.9 vs 28.2/26.6) — one
                    # loop's control overhead instead of two, never worse.
                    def vbody(k, a, tym=tym, txm=txm, txn=txn, ntx=ntx,
                              base=base, LO=LO, tyv=tyv, txv=txv):
                        ty = tym + k // txn
                        tx = txm + k % txn
                        t = base + ty * ntx + tx
                        cand = jnp.take_along_axis(t_ref[0, t], LO, axis=1)
                        m = (tyv == ty) & (txv == tx)  # (1,128)
                        return a + jnp.where(m, cand, zero)

                    part = jax.lax.fori_loop(0, tyn * txn, vbody, zero)
                if packed:
                    part = pltpu.bitcast(part, jnp.bfloat16)  # (4D, 128)
                w4 = w4_a[g][qb]  # (4,128)
                acc = acc + (part.reshape(4, D, LANES)
                             * w4[:, None, :]).astype(jnp.float32).sum(0)
            o_ref[0, qb] = acc

    return kernel


def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    interpret: bool | None = None,
    qpb_max: int = 8,
    permute: bool | None = None,
    mxu: bool | None = None,
    fuse_points: bool | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for `ms_deform_attn_xla` (same shapes/semantics).

    bf16 values take the packed path (bf16 table, exactly the XLA path's
    sampling precision); other dtypes sample from an f32 table.

    permute: None = auto (tile-major-permute encoder-shaped queries);
    False = caller already permuted (the SPMD wrapper hoists the permutation
    outside the custom_partitioning boundary, whose jaxpr must be const-free).

    mxu: route the per-tile sample through a one-hot MXU matmul instead of
    the lane gather (identical results — the one-hot is exact). Default via
    env MSDA_FWD_MXU for A/B runs.

    fuse_points: visit the union tile bbox of each level's P points in one
    loop (P gathers per tile visit) instead of P separate loops. DEFAULT ON:
    interleaved on-chip A/B in the realistic tight-offset regime measured
    medians 18.4 vs 26.3 ms (-30%, encoder shape, bf16); parity is exact
    (same gathers, same adds). `MSDA_FUSE=0` restores per-point for A/B.
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if mxu is None:
        mxu = os.environ.get("MSDA_FWD_MXU", "0") == "1"
    if fuse_points is None:
        fuse_points = os.environ.get("MSDA_FUSE", "1") == "1"
    # pltpu.bitcast is TPU-only; interpret mode uses the f32 table
    packed = value.dtype == jnp.bfloat16 and not interpret and not mxu

    geoms, nt = _level_geoms(spatial_shapes)
    if permute is None:
        permute = Lq == sum(h * w for h, w, *_ in geoms)
    permuted = permute
    lqw = len(_tile_major_perm(spatial_shapes)[0]) if permuted else Lq
    nqb_raw = _cdiv(lqw, LANES)
    # q-blocks per grid step: bound per-step VMEM and the statically-unrolled
    # kernel body while keeping DMAs chunky. 8 is A/B-tested optimal on v5e
    # (81 vs 85-88 ms for 16 at the flagship shape, back-to-back runs);
    # Mosaic block specs need the sublane dim divisible by 8, so 4 is
    # unlowerable anyway
    qpb = min(qpb_max, nqb_raw)
    nqb = _cdiv(nqb_raw, qpb) * qpb
    qs_steps = nqb // qpb

    table = _build_tables(value, spatial_shapes, packed,
                          bf16_unpacked=mxu and value.dtype == jnp.bfloat16)
    locx, locy, attk, bounds = _transpose_inputs(
        sampling_locations, attention_weights, spatial_shapes, nqb,
        permute=permute)

    BM = B * M
    CR = 2 * D if packed else 4 * D
    kernel = _make_kernel(tuple(geoms), L, P, D, qpb, packed, mxu=mxu,
                          fuse_points=fuse_points)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BM, nqb, D, LANES), jnp.float32),
        grid=(BM, qs_steps),
        in_specs=[
            pl.BlockSpec((1, L, P, nqb, 4), lambda b, q: (b, 0, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nt, CR, LANES), lambda b, q: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, P, qpb, LANES), lambda b, q: (b, 0, 0, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, P, qpb, LANES), lambda b, q: (b, 0, 0, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, P, qpb, LANES), lambda b, q: (b, 0, 0, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qpb, D, LANES), lambda b, q: (b, q, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bounds, table, locx, locy, attk)

    # (BM, nqb, D, 128) -> (B, lqw, M*D) -> un-permute (and un-pad) queries
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(BM, D, nqb * LANES)
    out = out[:, :, :lqw].reshape(B, M, D, lqw)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(B, lqw, M * D)
    if permuted:
        out = jnp.take(out, _tile_major_perm(spatial_shapes)[1], axis=1)
    return out.astype(value.dtype)


# ---------------------------------------------------------------------------
# Backward kernel
#
# The reference ships SIX CUDA col2im variants for this gradient
# (ms_deform_im2col_cuda.cuh:302-1030), all built on shared-memory reductions
# or global atomicAdd. TPUs have neither atomics nor per-thread scatter, so
# the kernel reformulates the value-gradient scatter as MXU matmuls:
#
#   * d_loc / d_attn are GATHER-shaped: re-gather each sample's 2x2 patch row
#     (same tile loop as the forward) and contract with the output cotangent
#     — pure VPU work, exactly the forward's access pattern;
#   * d_value is a scatter of per-sample weighted cotangents into the patch
#     table. Per (level, point, query-block, tile) it becomes ONE-HOT MATMUL:
#       d_tile[4D, lane] += A[4D, q] @ onehot[q, lane],
#     onehot[q, lane] = (sample q's in-tile lane == lane) & (q hits tile) —
#     a (4D x 128) x (128 x 128) MXU contraction instead of 128 scattered
#     adds. The tile's d_table block accumulates in VMEM across the whole
#     query grid (output block index is constant along the query dim), and
#     the XLA epilogue un-tiles + reverse-rolls it into d_value.
# ---------------------------------------------------------------------------


def _make_bwd_kernel(geoms, L: int, P: int, D: int, qpb: int,
                     bf16_mm: bool = False, linear_visit: bool = False,
                     fuse_points: bool = False, packed_in: bool = False):
    """bf16_mm: run the d_table one-hot matmuls with bf16 operands (f32
    accumulate). Used when the primal value is bf16 — the cotangent products
    are bf16-precision in bf16 training anyway — for the 2x MXU rate.

    fuse_points: one union-bbox loop per level; per visit the P points'
    one-hot scatters concatenate into a single (CR, P*128) x (P*128, 128)
    MXU dot — a 4x larger contraction than the per-point dots, plus 4x less
    scalar loop setup.

    packed_in: the INPUT table arrives int32-packed (two bf16 channels per
    sublane, same as the forward's packed path) — halves the per-visit
    gather rows and the table's VMEM traffic. Only the gathered table is
    packed; the d_table accumulator stays unpacked f32. Exact: bf16->f32
    promotion of the gathered values is lossless, and each sample's visit
    mask selects exactly one tile so int32 accumulation never mixes
    payloads."""
    CR = 4 * D  # d_table accumulator rows (always unpacked f32)
    CRG = 2 * D if packed_in else 4 * D  # gathered table rows per tile
    gz_dt = jnp.int32 if packed_in else jnp.float32
    mm_dt = jnp.bfloat16 if bf16_mm else jnp.float32

    def _unpack(part):
        # (CRG, LANES) gather accumulator -> (4, D, LANES) sample values
        if packed_in:
            part = pltpu.bitcast(part, jnp.bfloat16)
        return part.reshape(4, D, LANES)

    def kernel(bounds_ref, t_ref, locx_ref, locy_ref, att_ref, go_ref,
               dt_ref, dlx_ref, dly_ref, datt_ref):
        qs = pl.program_id(1)

        @pl.when(qs == 0)
        def _init():
            dt_ref[...] = jnp.zeros(dt_ref.shape, dt_ref.dtype)

        zero = jnp.zeros((CRG, LANES), gz_dt)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)

        # anchor math + slot weights AND their coordinate derivatives,
        # vectorized over all qpb blocks of this grid step
        pre = []
        for l, (H, W, nty, ntx, base) in enumerate(geoms):
            for p in range(P):
                x = locx_ref[0, l, p] * W - 0.5  # (qpb, 128)
                y = locy_ref[0, l, p] * H - 0.5
                ax, ay, fx, fy, x0i, y0i = _anchors(x, y, H, W)
                wx0, wx1 = _slot_w(fx, ax, x0i, W)
                wy0, wy1 = _slot_w(fy, ay, y0i, H)
                gx0, gx1 = _slot_g(ax, x0i, W)
                gy0, gy1 = _slot_g(ay, y0i, H)
                pre.append((
                    ay // TY, ax // TX, (ay % TY) * TX + ax % TX,
                    jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], 1),
                    jnp.stack([wy0 * gx0, wy0 * gx1, wy1 * gx0, wy1 * gx1], 1),
                    jnp.stack([gy0 * wx0, gy0 * wx1, gy1 * wx0, gy1 * wx1], 1),
                ))  # ty/tx/lo (qpb,128); w4/dx4/dy4 (qpb,4,128)

        for qb in range(qpb):  # static unroll (ref indexing must be static)
            qa = qs * qpb + qb
            go_b = go_ref[0, qb]  # (D, 128) f32
            if fuse_points:
                for l, (H, W, nty, ntx, base) in enumerate(geoms):
                    pres = [pre[l * P + p] for p in range(P)]
                    As, mohs, LOs, tyvs, txvs = [], [], [], [], []
                    for p in range(P):
                        tyq, txq, loq, w4q, _, _ = pres[p]
                        lo = loq[qb]
                        aw = att_ref[0, l, p, qb]
                        A = ((w4q[qb] * aw[None])[:, None, :]
                             * go_b[None, :, :]).reshape(CR, LANES)
                        As.append(A.astype(mm_dt))
                        mohs.append(jnp.where(lo[:, None] == lane_ids,
                                              1.0, 0.0).astype(mm_dt))
                        LOs.append(jnp.broadcast_to(lo[None], (CRG, LANES)))
                        tyvs.append(tyq[qb][None])
                        txvs.append(txq[qb][None])
                    A_cat = jnp.concatenate(As, axis=1)  # (CR, P*LANES)
                    uy0, uy1, ux0, ux1 = _union_bbox(bounds_ref, l, qa, P)
                    txn_u = ux1 - ux0

                    def vbody(k, accs, uy0=uy0, ux0=ux0, txn_u=txn_u,
                              ntx=ntx, base=base, A_cat=A_cat, mohs=mohs,
                              LOs=LOs, tyvs=tyvs, txvs=txvs):
                        ty = uy0 + k // txn_u
                        tx = ux0 + k % txn_u
                        t = base + ty * ntx + tx
                        tile = t_ref[0, t]  # read once, shared by P points
                        out, rows = [], []
                        for p in range(P):
                            m = (tyvs[p] == ty) & (txvs[p] == tx)
                            cand = jnp.take_along_axis(tile, LOs[p], axis=1)
                            out.append(accs[p] + jnp.where(m, cand, zero))
                            mrow = jnp.where(m, 1.0, 0.0).reshape(
                                LANES, 1).astype(A_cat.dtype)
                            rows.append(mohs[p] * mrow)
                        oh_cat = jnp.concatenate(rows, axis=0)  # (P*L, L)
                        dt_ref[0, t] += jnp.dot(
                            A_cat, oh_cat,
                            preferred_element_type=jnp.float32)
                        return tuple(out)

                    parts = jax.lax.fori_loop(
                        0, (uy1 - uy0) * txn_u, vbody, (zero,) * P)
                    for p in range(P):
                        _, _, _, w4q, dx4q, dy4q = pres[p]
                        aw = att_ref[0, l, p, qb]
                        v4 = _unpack(parts[p])
                        s4 = (v4 * go_b[None]).sum(1)  # (4, 128)
                        datt_ref[0, l, p, qb] = (w4q[qb] * s4).sum(0)
                        dlx_ref[0, l, p, qb] = aw * W * (dx4q[qb] * s4).sum(0)
                        dly_ref[0, l, p, qb] = aw * H * (dy4q[qb] * s4).sum(0)
                continue
            for g, (l, (H, W, nty, ntx, base)) in enumerate(
                    (l, geom) for l, geom in enumerate(geoms)
                    for _ in range(P)):
                p = g % P
                tyq, txq, loq, w4q, dx4q, dy4q = pre[g]
                tyv = tyq[qb][None]  # (1, 128)
                txv = txq[qb][None]
                lo = loq[qb]  # (128,)
                LO = jnp.broadcast_to(lo[None], (CRG, LANES))
                aw = att_ref[0, l, p, qb]  # (128,)
                w4 = w4q[qb]  # (4, 128), attention NOT included
                # scatter payload: rows slot*D+d hold w4[slot]*attn*go[d]
                A = ((w4 * aw[None])[:, None, :]
                     * go_b[None, :, :]).reshape(CR, LANES).astype(mm_dt)
                # bool -> f32 -> mm dtype (no direct i1 -> bf16 in Mosaic)
                onehot_full = jnp.where(lo[:, None] == lane_ids,
                                        1.0, 0.0).astype(mm_dt)
                tym = bounds_ref[0, l, p, qa, 0]
                tyn = bounds_ref[0, l, p, qa, 1]
                txm = bounds_ref[0, l, p, qa, 2]
                txn = bounds_ref[0, l, p, qa, 3]

                def visit(ty, tx, acc, ntx=ntx, base=base, LO=LO, tyv=tyv,
                          txv=txv, A=A, onehot_full=onehot_full):
                    t = base + ty * ntx + tx
                    m = (tyv == ty) & (txv == tx)  # (1, 128) over queries
                    cand = jnp.take_along_axis(t_ref[0, t], LO, axis=1)
                    acc = acc + jnp.where(m, cand, zero)
                    # mask rows (queries) of the one-hot; go through f32
                    # before the (128,)->(128,1) reshape — Mosaic only
                    # supports minor-dim insertion for 32-bit types
                    mrow = jnp.where(m, 1.0, 0.0).reshape(
                        LANES, 1).astype(A.dtype)
                    dt_ref[0, t] += jnp.dot(
                        A, onehot_full * mrow,
                        preferred_element_type=jnp.float32)
                    return acc

                if linear_visit:
                    # linearized bbox loop — WINS in the forward kernel but
                    # LOSES here: interleaved on-chip A/B at the flagship
                    # encoder shape (bf16) measured nested 297-299 ms vs
                    # linear 309-313 across two rounds; the per-visit MXU
                    # dot pipelines better under the nested loop than with
                    # the divmod index recovery. Kept for A/B runs only.
                    def vbody(k, acc, tym=tym, txm=txm, txn=txn):
                        return visit(tym + k // txn, txm + k % txn, acc)

                    part = jax.lax.fori_loop(0, tyn * txn, vbody, zero)
                else:
                    def ybody(ky, acc, tym=tym, txm=txm, txn=txn):
                        return jax.lax.fori_loop(
                            0, txn,
                            lambda kx, a: visit(tym + ky, txm + kx, a), acc)

                    part = jax.lax.fori_loop(0, tyn, ybody, zero)
                v4 = _unpack(part)
                s4 = (v4 * go_b[None]).sum(1)  # (4, 128): v_slot . go
                datt_ref[0, l, p, qb] = (w4 * s4).sum(0)
                dlx_ref[0, l, p, qb] = aw * W * (dx4q[qb] * s4).sum(0)
                dly_ref[0, l, p, qb] = aw * H * (dy4q[qb] * s4).sum(0)

    return kernel


def _untile_dtable(dtab: jnp.ndarray, spatial_shapes: SpatialShapes,
                   B: int, M: int, D: int) -> jnp.ndarray:
    """(BM, NT, 4D, LANES) f32 patch-table cotangent -> (B, S, M, D) value
    gradient: reverse the spatial tiling, then reverse the table's rolls
    (forward row s holds [v(s), v(s+1), v(s+W), v(s+W+1)], so slot k's
    column scatters BACK by the matching positive roll)."""
    geoms, _ = _level_geoms(spatial_shapes)
    outs = []
    for (H, W, nty, ntx, base) in geoms:
        t = dtab[:, base : base + nty * ntx]  # (BM, ntiles, 4D, 128)
        t = t.reshape(B, M, nty, ntx, 4 * D, TY, TX)
        t = jnp.transpose(t, (0, 1, 2, 5, 3, 6, 4))  # (B,M,nty,TY,ntx,TX,4D)
        t = t.reshape(B, M, nty * TY, ntx * TX, 4 * D)[:, :, :H, :W]
        t = t.reshape(B, M, H * W, 4, D)
        dv = (t[:, :, :, 0]
              + jnp.roll(t[:, :, :, 1], 1, axis=2)
              + jnp.roll(t[:, :, :, 2], W, axis=2)
              + jnp.roll(t[:, :, :, 3], W + 1, axis=2))
        outs.append(dv)
    dvh = jnp.concatenate(outs, axis=2)  # (B, M, S, D)
    return jnp.transpose(dvh, (0, 2, 1, 3))


def ms_deform_attn_pallas_bwd(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    g: jnp.ndarray,
    interpret: bool | None = None,
    qpb_max: int = 8,
    permute: bool | None = None,
    linear_visit: bool = False,
    fuse_points: bool | None = None,
):
    """Pallas backward: (d_value, d_sampling_locations, d_attention_weights)
    for cotangent g of shape (B, Lq, M*D). Semantics match XLA autodiff of
    `ms_deform_attn_xla` exactly (same anchor/slot-weight decisions).

    linear_visit: linearized fori_loop over each tile bbox instead of the
    nested (row, col) pair — wins in the FORWARD kernel but measured ~4%
    slower here (see kernel comment); nested is the default.

    fuse_points: one union-bbox loop per level with the P one-hot scatters
    concatenated into a single MXU dot per visit. DEFAULT ON: interleaved
    on-chip A/B in the realistic tight-offset regime measured medians 42.7
    vs 59.0 ms (-28%, encoder shape, bf16) at parity rel 7e-8 (the only
    difference is f32-accumulation order of the per-point dots).
    `MSDA_FUSE=0` restores per-point for A/B."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if fuse_points is None:
        fuse_points = os.environ.get("MSDA_FUSE", "1") == "1"

    geoms, nt = _level_geoms(spatial_shapes)
    if permute is None:
        permute = Lq == sum(h * w for h, w, *_ in geoms)
    if permute:
        perm, inv = _tile_major_perm(spatial_shapes)
        src, first = _perm_cotangent_maps(spatial_shapes)
        loc_p = jnp.take(sampling_locations.reshape(B, Lq, -1), perm,
                         axis=1).reshape(B, len(perm), M, L, P, 2)
        att_p = jnp.take(attention_weights.reshape(B, Lq, -1), perm,
                         axis=1).reshape(B, len(perm), M, L, P)
        g_p = jnp.take(g, src, axis=1) * first[:, None]
        d_val, d_loc_p, d_att_p = ms_deform_attn_pallas_bwd(
            value, spatial_shapes, loc_p, att_p, g_p,
            interpret=interpret, qpb_max=qpb_max, permute=False,
            linear_visit=linear_visit, fuse_points=fuse_points)
        d_loc = jnp.take(d_loc_p, inv, axis=1)
        d_att = jnp.take(d_att_p, inv, axis=1)
        return d_val, d_loc, d_att

    lqw = Lq
    nqb_raw = _cdiv(lqw, LANES)
    qpb = min(qpb_max, nqb_raw)
    nqb = _cdiv(nqb_raw, qpb) * qpb
    qs_steps = nqb // qpb

    # bf16 values gather from the int32-packed table like the forward
    # (halved table build + VMEM traffic; exact — see _make_bwd_kernel);
    # MSDA_BWD_PACKED=0 restores the unpacked f32 table for A/B
    packed_in = (value.dtype == jnp.bfloat16 and not interpret
                 and os.environ.get("MSDA_BWD_PACKED", "1") == "1")
    table = _build_tables(value, spatial_shapes, packed=packed_in)
    locx, locy, attk, bounds = _transpose_inputs(
        sampling_locations, attention_weights, spatial_shapes, nqb,
        permute=False)
    BM = B * M
    CR = 4 * D
    CRT = 2 * D if packed_in else 4 * D  # input-table rows

    # cotangent into kernel layout (BM, nqb, D, LANES) — ZERO padding (edge
    # padding would double-count tail queries into d_table)
    gk = g.astype(jnp.float32).reshape(B, lqw, M, D)
    gk = jnp.transpose(gk, (0, 2, 3, 1)).reshape(BM, D, lqw)
    gk = jnp.pad(gk, ((0, 0), (0, 0), (0, nqb * LANES - lqw)))
    gk = jnp.transpose(gk.reshape(BM, D, nqb, LANES), (0, 2, 1, 3))

    kernel = _make_bwd_kernel(
        tuple(geoms), L, P, D, qpb,
        bf16_mm=value.dtype == jnp.bfloat16 and not interpret,
        linear_visit=linear_visit, fuse_points=fuse_points,
        packed_in=packed_in)
    dtab, dlx, dly, datt = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((BM, nt, CR, LANES), jnp.float32),
            jax.ShapeDtypeStruct((BM, L, P, nqb, LANES), jnp.float32),
            jax.ShapeDtypeStruct((BM, L, P, nqb, LANES), jnp.float32),
            jax.ShapeDtypeStruct((BM, L, P, nqb, LANES), jnp.float32),
        ),
        grid=(BM, qs_steps),
        in_specs=[
            pl.BlockSpec((1, L, P, nqb, 4), lambda b, q: (b, 0, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nt, CRT, LANES), lambda b, q: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, P, qpb, LANES), lambda b, q: (b, 0, 0, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, P, qpb, LANES), lambda b, q: (b, 0, 0, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, P, qpb, LANES), lambda b, q: (b, 0, 0, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qpb, D, LANES), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # d_table accumulates across the query grid dim (constant index)
            pl.BlockSpec((1, nt, CR, LANES), lambda b, q: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, P, qpb, LANES), lambda b, q: (b, 0, 0, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, P, qpb, LANES), lambda b, q: (b, 0, 0, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, P, qpb, LANES), lambda b, q: (b, 0, 0, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(bounds, table, locx, locy, attk, gk)

    d_value = _untile_dtable(dtab, spatial_shapes, B, M, D).astype(value.dtype)

    def unpack_q(a):  # (BM, L, P, nqb, LANES) -> (B, lqw, M, L, P)
        a = a.reshape(B, M, L, P, nqb * LANES)[..., :lqw]
        return jnp.transpose(a, (0, 4, 1, 2, 3))

    d_loc = jnp.stack([unpack_q(dlx), unpack_q(dly)], axis=-1).astype(
        sampling_locations.dtype)
    d_att = unpack_q(datt).astype(attention_weights.dtype)
    return d_value, d_loc, d_att


@functools.lru_cache(maxsize=None)
def _spmd_pallas_backward(spatial_shapes: SpatialShapes):
    """SPMD batch-partitioned backward (same contract as the forward's
    custom_partitioning: batch dim 0 everywhere, const-free region — the
    caller hoists the query permutation)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def f(value, sampling_locations, attention_weights, g):
        return ms_deform_attn_pallas_bwd(
            value, spatial_shapes, sampling_locations, attention_weights, g,
            permute=False)

    def partition(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        b = spec[0] if len(spec) else None

        def ns(*s):
            return NamedSharding(mesh, PartitionSpec(*s))

        def lower(v, loc, attn, g):
            return ms_deform_attn_pallas_bwd(
                v, spatial_shapes, loc, attn, g, permute=False)

        return mesh, lower, (ns(b), ns(b), ns(b)), (ns(b), ns(b), ns(b), ns(b))

    f.def_partition(
        partition=partition,
        sharding_rule=("b s m d, b q m2 l p x, b q2 m3 l2 p2, b q3 e "
                       "-> b s m d, b q m2 l p x, b q2 m3 l2 p2"),
    )
    return f


@functools.lru_cache(maxsize=None)
def _spmd_pallas_forward(spatial_shapes: SpatialShapes):
    """SPMD-partitionable Pallas forward: under a multi-device pjit the SPMD
    partitioner runs the kernel on each device's LOCAL batch shard (all
    operands and the output share batch dim 0; everything else is gathered to
    replicated) — the mesh-native analog of the reference CUDA op's implicit
    per-GPU batch split under DDP. Single-device jit lowers unchanged."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    @custom_partitioning
    def f(value, sampling_locations, attention_weights):
        # permute=False: the query permutation is applied by the caller —
        # custom_partitioning requires a const-free jaxpr and the permutation
        # indices are host constants
        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights,
            permute=False)

    def partition(mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        b = spec[0] if len(spec) else None

        def ns(*s):
            return NamedSharding(mesh, PartitionSpec(*s))

        def lower(v, loc, attn):
            return ms_deform_attn_pallas(v, spatial_shapes, loc, attn,
                                         permute=False)

        return mesh, lower, ns(b), (ns(b), ns(b), ns(b))

    # only the batch factor `b` is shared across operands/result, so Shardy
    # propagates exactly batch sharding; the partition callback re-shards any
    # other layout to (batch-split, replicated-elsewhere) before the kernel
    f.def_partition(
        partition=partition,
        sharding_rule="b s m d, b q m2 l p x, b q2 m3 l2 p2 -> b q e",
    )
    return f


def _spmd_forward(value, spatial_shapes, sampling_locations,
                  attention_weights):
    """Apply the (host-constant) tile-major query permutation OUTSIDE the
    const-free custom_partitioning region, then run the partitioned kernel.
    Queries live on a replicated axis, so permuting outside is
    sharding-neutral."""
    B, Lq, M, L, P, _ = sampling_locations.shape
    S = sum(h * w for h, w in spatial_shapes)
    if Lq != S:
        return _spmd_pallas_forward(spatial_shapes)(
            value, sampling_locations, attention_weights)
    perm, inv = _tile_major_perm(spatial_shapes)
    loc_p = jnp.take(sampling_locations.reshape(B, Lq, -1), perm,
                     axis=1).reshape(B, len(perm), M, L, P, 2)
    att_p = jnp.take(attention_weights.reshape(B, Lq, -1), perm,
                     axis=1).reshape(B, len(perm), M, L, P)
    out = _spmd_pallas_forward(spatial_shapes)(value, loc_p, att_p)
    return jnp.take(out, inv, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_op(value, spatial_shapes, sampling_locations,
                             attention_weights):
    """custom_vjp wrapper: Pallas forward (SPMD batch-partitionable),
    XLA-autodiff backward.

    The backward of the reference CUDA op is a scatter-add
    (ms_deform_im2col_cuda.cuh:302-1030); here gradients recompute through
    the XLA gather formulation (remat-style, like the forward's XLA path),
    so training works regardless of Mosaic's missing dynamic-scatter.
    """
    return _spmd_forward(value, spatial_shapes, sampling_locations,
                         attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _spmd_forward(value, spatial_shapes, sampling_locations,
                        attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _spmd_backward(value, spatial_shapes, loc, attn, g):
    """Backward with the query permutation hoisted outside the SPMD region
    (mirror of `_spmd_forward`)."""
    B, Lq = loc.shape[:2]
    S = sum(h * w for h, w in spatial_shapes)
    if Lq != S:
        return _spmd_pallas_backward(spatial_shapes)(value, loc, attn, g)
    perm, inv = _tile_major_perm(spatial_shapes)
    src, first = _perm_cotangent_maps(spatial_shapes)
    M, L, P = loc.shape[2], loc.shape[3], loc.shape[4]
    loc_p = jnp.take(loc.reshape(B, Lq, -1), perm,
                     axis=1).reshape(B, len(perm), M, L, P, 2)
    att_p = jnp.take(attn.reshape(B, Lq, -1), perm,
                     axis=1).reshape(B, len(perm), M, L, P)
    g_p = jnp.take(g, src, axis=1) * first[:, None]
    d_val, d_loc_p, d_att_p = _spmd_pallas_backward(spatial_shapes)(
        value, loc_p, att_p, g_p)
    return d_val, jnp.take(d_loc_p, inv, axis=1), jnp.take(d_att_p, inv, axis=1)


def _bwd(spatial_shapes, res, g):
    value, loc, attn = res
    if jax.default_backend() in ("tpu", "axon"):
        # Pallas backward kernel: gather-shaped d_loc/d_attn + one-hot-matmul
        # d_value scatter (the TPU answer to the reference's 6 CUDA col2im
        # variants, ms_deform_im2col_cuda.cuh:302-1030)
        return _spmd_backward(value, spatial_shapes, loc, attn, g)
    # CPU/GPU: autodiff through the XLA oracle formulation
    from .ms_deform_attn import ms_deform_attn_xla

    _, vjp = jax.vjp(
        lambda v, sl, a: ms_deform_attn_xla(v, spatial_shapes, sl, a),
        value, loc, attn)
    return vjp(g)


ms_deform_attn_pallas_op.defvjp(_fwd, _bwd)
