"""Hungarian matcher, TPU-native (reference models/matcher.py:12-227).

Costs are computed on device inside jit over *static* padded instance slots;
the assignment itself is solved on device by an exact shortest-augmenting-path
LAP solver (`lsa_on_device`, the same algorithm as scipy's
linear_sum_assignment) — nothing crosses to the host, which the axon TPU
runtime requires (no host callbacks) and which keeps the whole train step one
jitted program.

Static target layout (built by the collators):
  masks:    (T, B, N, H, W)  binary, model-input resolution
  boxes:    (T, B, N, 4)     normalized cxcywh (zeros when invisible)
  labels:   (B, N)           int32 class ids
  inst_valid: (B, N)         bool — slot holds a real instance
  is_ref_inst_visible: (T, B, N) bool — per-frame visibility
  referred_instance_idx: (B,) int32

Returned assignment: (B, N) int32 — the query index matched to each instance
slot (-1 for invalid slots).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.boxes import box_cxcywh_to_xyxy, generalized_box_iou

BIG = 1e8


@dataclasses.dataclass(frozen=True)
class MatchCosts:
    cost_con: float = 0.0
    cost_cls: float = 2.0
    cost_dice: float = 5.0
    cost_box: float = 2.0
    cost_giou: float = 2.0
    num_classes: int = 1


def _focal_pos_neg(p: jnp.ndarray, alpha=0.25, gamma=2.0):
    eps = 1e-8
    neg = (1 - alpha) * (p ** gamma) * (-jnp.log(1 - p + eps))
    pos = alpha * ((1 - p) ** gamma) * (-jnp.log(p + eps))
    return pos, neg


def compute_cost_matrix(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    upsampled_mask_logits: jnp.ndarray,  # (T, B, Nq, H, W) at target mask res
    costs: MatchCosts,
) -> jnp.ndarray:
    """Returns (B, Nq, N) float32 with invalid instance columns set to BIG."""
    pred_cls = jax.nn.sigmoid(
        outputs["pred_cls"].astype(jnp.float32)
    )  # (T, B, Nq, K)
    T, B, Nq, K = pred_cls.shape
    vis = targets["is_ref_inst_visible"].astype(jnp.float32)  # (T, B, N)
    valid = targets["inst_valid"]  # (B, N)
    N = valid.shape[1]

    C = jnp.zeros((B, Nq, N), jnp.float32)

    if costs.cost_cls > 0:
        pos, neg = _focal_pos_neg(pred_cls)
        if costs.num_classes == 1:
            diff = (pos - neg)[..., 0]  # (T, B, Nq)
            diff = jnp.broadcast_to(diff[..., None], (T, B, Nq, N))
        else:
            lbl = targets["labels"]  # (B, N)
            diff_all = pos - neg  # (T, B, Nq, K)
            diff = jnp.take_along_axis(
                diff_all[:, :, :, None, :],
                jnp.broadcast_to(lbl[None, :, None, :, None], (T, B, 1, N, 1)).astype(jnp.int32),
                axis=-1,
            )[..., 0]  # (T, B, Nq, N)
        # average over visible frames of each instance (reference
        # models/matcher.py:167-177 indexes visible frames then means over t)
        w = vis[:, :, None, :]  # (T, B, 1, N)
        denom = jnp.maximum(w.sum(0), 1.0)
        cls_cost = (diff * w).sum(0) / denom  # (B, Nq, N)
        C = C + costs.cost_cls * cls_cost

    if costs.cost_dice > 0:
        probs = jax.nn.sigmoid(upsampled_mask_logits.astype(jnp.float32))
        pr = probs.reshape(T, B, Nq, -1)
        tg = targets["masks"].astype(jnp.float32).reshape(T, B, N, -1)
        inter = jnp.einsum("tbqp,tbnp->tbqn", pr, tg)
        denom = pr.sum(-1)[..., None] + tg.sum(-1)[:, :, None, :]
        coef = (2 * inter + 1.0) / (denom + 1.0)
        C = C - costs.cost_dice * coef.mean(0)

    if costs.cost_box > 0:
        pb = outputs["pred_boxes"].astype(jnp.float32)  # (T, B, Nq, 4)
        tb = targets["boxes"].astype(jnp.float32)  # (T, B, N, 4)
        l1 = jnp.abs(pb[:, :, :, None, :] - tb[:, :, None, :, :]).sum(-1)
        C = C + costs.cost_box * l1.mean(0)

    if costs.cost_giou > 0:
        pb = box_cxcywh_to_xyxy(outputs["pred_boxes"].astype(jnp.float32))
        tb = box_cxcywh_to_xyxy(targets["boxes"].astype(jnp.float32))
        giou = generalized_box_iou(
            pb.reshape(T * B, Nq, 4), tb.reshape(T * B, N, 4)
        ).reshape(T, B, Nq, N)
        C = C - costs.cost_giou * giou.mean(0)

    if costs.cost_con > 0:
        logit = outputs["pred_logit"].astype(jnp.float32)  # (B, Nq, Cd)
        txt = outputs["text_sentence_feature"].astype(jnp.float32)  # (B, Cd)
        sim = jnp.einsum("bqc,bc->bq", logit, txt)
        con = jax.nn.softmax(sim, axis=-1)[..., None]  # (B, Nq, 1)
        C = C - costs.cost_con * jnp.broadcast_to(con, (B, Nq, N))

    C = jnp.where(valid[:, None, :], C, BIG)
    return C


_UNVISITED = jnp.float32(1e30)


def _lsa_single(C: jnp.ndarray) -> jnp.ndarray:
    """Exact rectangular linear sum assignment, fully on device.

    C: (N, M) float32 cost with N <= M rows to assign. Returns (N,) int32 —
    the column assigned to each row. Direct implementation of the
    shortest-augmenting-path algorithm (Crouse 2016), the same algorithm as
    scipy.optimize.linear_sum_assignment (which the reference calls on the CPU
    at models/matcher.py:103-109); the column scan is vectorized with masked
    min-reductions, the augmentation chains are lax.while_loops.
    """
    N, M = C.shape
    C = C.astype(jnp.float32)

    def augment_row(cur_row, state):
        u, v, col4row, row4col = state

        # --- Dijkstra over alternating paths from cur_row -------------
        def dij_cond(s):
            return s[0] == -1

        def dij_body(s):
            sink, i, min_val, SR, SC, spc, path = s
            SR = SR.at[i].set(True)
            cand = min_val + C[i] - u[i] - v  # (M,)
            better = (cand < spc) & ~SC
            spc = jnp.where(better, cand, spc)
            path = jnp.where(better, i, path)
            masked = jnp.where(SC, _UNVISITED, spc)
            lowest = jnp.min(masked)
            # among equal minima prefer an unassigned column (scipy tie-break;
            # guarantees progress, any choice is still exact)
            prefer = (masked <= lowest) & (row4col == -1)
            j = jnp.where(jnp.any(prefer), jnp.argmax(prefer),
                          jnp.argmin(masked)).astype(jnp.int32)
            SC = SC.at[j].set(True)
            hit_free = row4col[j] == -1
            sink = jnp.where(hit_free, j, jnp.int32(-1))
            i = jnp.where(hit_free, i, row4col[j])
            return sink, i, lowest, SR, SC, spc, path

        sink, _, min_val, SR, SC, spc, path = jax.lax.while_loop(
            dij_cond, dij_body,
            (jnp.int32(-1), jnp.int32(cur_row), jnp.float32(0.0),
             jnp.zeros((N,), bool), jnp.zeros((M,), bool),
             jnp.full((M,), _UNVISITED), jnp.zeros((M,), jnp.int32)),
        )

        # --- dual updates ---------------------------------------------
        u = u.at[cur_row].add(min_val)
        spc_at_row_col = spc[jnp.clip(col4row, 0)]  # (N,)
        u = jnp.where(
            SR & (jnp.arange(N) != cur_row), u + min_val - spc_at_row_col, u
        )
        v = jnp.where(SC, v - (min_val - spc), v)

        # --- augment along the found path ------------------------------
        def aug_cond(s):
            return ~s[0]

        def aug_body(s):
            _, sink, col4row, row4col = s
            i = path[sink]
            row4col = row4col.at[sink].set(i)
            nxt = col4row[i]
            col4row = col4row.at[i].set(sink)
            return i == cur_row, nxt, col4row, row4col

        _, _, col4row, row4col = jax.lax.while_loop(
            aug_cond, aug_body,
            (jnp.bool_(False), sink, col4row, row4col),
        )
        return u, v, col4row, row4col

    init = (
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((M,), jnp.float32),
        jnp.full((N,), -1, jnp.int32),
        jnp.full((M,), -1, jnp.int32),
    )
    _, _, col4row, _ = jax.lax.fori_loop(0, N, augment_row, init)
    return col4row


def lsa_on_device(C: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Batched exact assignment. C: (B, Nq, N) query-by-instance costs;
    valid: (B, N). Returns (B, N) int32 query per instance slot, -1 on
    invalid slots.

    Invalid columns are zeroed (not BIG) before solving: a per-column-constant
    cost is assignment-indifferent, and BIG-scale (1e8) entries would wreck
    the float32 dual updates (catastrophic cancellation quantizes real costs
    by O(BIG * eps) ≈ 8 — observed to produce suboptimal matches)."""
    C = jnp.clip(jnp.nan_to_num(C.astype(jnp.float32)), -1e6, 1e6)
    C = jnp.where(valid[:, None, :], C, 0.0)
    B, Nq, N = C.shape
    if N <= Nq:
        # rows must be the small side (the _lsa_single precondition — more
        # rows than columns would leave its augmenting search with no free
        # column and spin the while_loop forever): solve over C^T
        # (instances assign queries)
        out = jax.vmap(_lsa_single)(jnp.swapaxes(C, 1, 2))  # (B, N)
        return jnp.where(valid, out, -1)
    # More instance slots than queries (never the case in any reference
    # workload, but legal config-wise): solve queries->instances and invert;
    # the Nq matched instances get their query, the rest stay -1 — scipy's
    # rectangular linear_sum_assignment semantics. Here WHICH columns get
    # matched matters, so invalid columns must be strictly worse than any
    # valid one — use a dynamic moderate penalty (BIG-scale constants would
    # wreck the f32 dual updates, see above).
    big = 2.0 * jnp.max(jnp.abs(C)) + 1.0
    Cq = jnp.where(valid[:, None, :], C, big)
    inst4q = jax.vmap(_lsa_single)(Cq)  # (B, Nq) instance per query
    out = jnp.full((B, N), -1, jnp.int32)
    out = out.at[jnp.arange(B)[:, None], inst4q].set(
        jnp.broadcast_to(jnp.arange(Nq, dtype=jnp.int32)[None], (B, Nq)))
    return jnp.where(valid, out, -1)


def hungarian_match(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    upsampled_mask_logits: jnp.ndarray,
    costs: MatchCosts,
) -> jnp.ndarray:
    """(B, N) query index per instance slot, -1 on invalid. Non-differentiable
    (matching runs under stop_gradient like torch.inference_mode)."""
    C = compute_cost_matrix(
        jax.lax.stop_gradient(outputs),
        targets,
        jax.lax.stop_gradient(upsampled_mask_logits),
        costs,
    )
    valid = targets["inst_valid"]
    B, _, N = C.shape
    if N == 1:
        # Every reference training workload annotates exactly one instance per
        # sample (the referred object — see e.g.
        # refer_youtube_vos_dataset.py:210 `frame_masks[ref_obj_idx].unsqueeze(0)`),
        # so assignment degenerates to an exact argmin.
        q = jnp.argmin(C[..., 0], axis=-1).astype(jnp.int32)  # (B,)
        return jnp.where(valid[:, 0], q, -1)[:, None]
    return lsa_on_device(C, valid)
