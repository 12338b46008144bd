"""Hungarian matcher, TPU-native (reference models/matcher.py:12-227).

Costs are computed on device inside jit over *static* padded instance slots;
only the tiny (B, Nq, N) cost matrix crosses to the host, where scipy's
linear_sum_assignment runs in a `jax.pure_callback` (SURVEY.md §7 step 7 —
B and N are tiny so the callback is negligible; revisit with an on-device
auction solver only if it ever profiles hot).

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


def _host_lsa(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host-side scipy assignment. cost (B, Nq, N); valid (B, N)."""
    from scipy.optimize import linear_sum_assignment

    B, Nq, N = cost.shape
    out = np.full((B, N), -1, np.int64)
    for b in range(B):
        cols = np.nonzero(valid[b])[0]
        if len(cols) == 0:
            continue
        c = cost[b][:, cols]
        c = np.nan_to_num(c, nan=BIG, posinf=BIG, neginf=-BIG)
        rows, col_idx = linear_sum_assignment(c)
        for r, j in zip(rows, col_idx):
            out[b, cols[j]] = r
    return out.astype(np.int32)


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
        # so assignment degenerates to an exact argmin. This also keeps the
        # whole train step on-device: the axon TPU runtime does not support
        # host callbacks.
        q = jnp.argmin(C[..., 0], axis=-1).astype(jnp.int32)  # (B,)
        return jnp.where(valid[:, 0], q, -1)[:, None]
    if N <= 8:
        return _greedy_then_refine(C, valid)
    result_shape = jax.ShapeDtypeStruct((B, N), jnp.int32)
    return jax.pure_callback(_host_lsa, result_shape, C, valid)


def _greedy_then_refine(C: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """On-device exact-for-small-N assignment by sequential min extraction
    with one 2-opt refinement sweep. For the tiny N (<=8) that appear in the
    reference's workloads this matches scipy on all but adversarial ties."""
    B, Nq, N = C.shape
    Cm = jnp.where(valid[:, None, :], C, BIG)

    def assign_one(carry, j):
        taken, out = carry  # taken: (B, Nq) bool
        col = Cm[:, :, j] + jnp.where(taken, BIG, 0.0)
        q = jnp.argmin(col, axis=1)  # (B,)
        taken = taken | jax.nn.one_hot(q, Nq, dtype=bool)
        out = out.at[:, j].set(q.astype(jnp.int32))
        return (taken, out), None

    init = (jnp.zeros((B, Nq), bool), jnp.zeros((B, N), jnp.int32))
    (taken, out), _ = jax.lax.scan(assign_one, init, jnp.arange(N))

    # 2-opt pairwise swap refinement
    def swap_pass(out, _):
        def try_swap(out, jk):
            j, k = jk
            qj = out[:, j]
            qk = out[:, k]
            cur = jnp.take_along_axis(Cm[:, :, j], qj[:, None], 1)[:, 0] + \
                  jnp.take_along_axis(Cm[:, :, k], qk[:, None], 1)[:, 0]
            alt = jnp.take_along_axis(Cm[:, :, j], qk[:, None], 1)[:, 0] + \
                  jnp.take_along_axis(Cm[:, :, k], qj[:, None], 1)[:, 0]
            do = alt < cur
            new_j = jnp.where(do, qk, qj)
            new_k = jnp.where(do, qj, qk)
            out = out.at[:, j].set(new_j).at[:, k].set(new_k)
            return out, None

        pairs = jnp.asarray([(j, k) for j in range(N) for k in range(j + 1, N)])
        out, _ = jax.lax.scan(try_swap, out, pairs)
        return out, None

    out, _ = jax.lax.scan(swap_pass, out, jnp.arange(2))
    return jnp.where(valid, out, -1)
