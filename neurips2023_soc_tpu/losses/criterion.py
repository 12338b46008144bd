"""SetCriterion — losses over matched query/instance pairs
(reference models/criterion.py:13-276), static-shape jnp.

Per decoder layer: Hungarian re-match, then mask (focal+dice), class (focal on
visibility-gated labels), box (L1+GIoU) and the video-level visual-linguistic
contrastive loss. `num_masks` is a *global* count: under pjit with fully
global batches the sum is already global; the reference's
`dist.all_reduce(num_masks)` (criterion.py:76-78) therefore needs no explicit
collective here.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import resize_bilinear
from .matcher import MatchCosts, hungarian_match
from .segmentation import dice_loss, sigmoid_focal_loss


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    costs: MatchCosts = MatchCosts()
    num_classes: int = 1
    eos_coef: float = 0.1
    use_vl_loss: bool = True
    aux_loss: bool = True
    # loss weights (configs/refer_youtube_vos.yaml:136-151)
    weight_con: float = 1.0
    weight_cls: float = 2.0
    weight_focal: float = 2.0
    weight_dice: float = 5.0
    weight_bbox: float = 2.0
    weight_giou: float = 2.0


def _take_queries(x: jnp.ndarray, assign: jnp.ndarray) -> jnp.ndarray:
    """x: (T, B, Nq, ...); assign: (B, N) -> (T, B, N, ...)."""
    idx = jnp.clip(assign, 0)  # (B, N)
    T = x.shape[0]
    idx_b = jnp.broadcast_to(idx[None], (T,) + idx.shape)  # (T, B, N)
    extra = x.ndim - 3
    idx_b = idx_b.reshape(idx_b.shape + (1,) * extra)
    return jnp.take_along_axis(x, idx_b, axis=2)


def _layer_losses(
    layer_out: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: CriterionConfig,
) -> Dict[str, jnp.ndarray]:
    T, B, Nq, K = layer_out["pred_cls"].shape
    Ht, Wt = targets["masks"].shape[-2:]
    N = targets["inst_valid"].shape[1]
    valid = targets["inst_valid"].astype(jnp.float32)  # (B, N)

    # full-res upsample of ALL queries is needed only for the matching cost,
    # which runs under stop_gradient — keep it out of the autodiff graph. The
    # loss upsamples only the matched queries (resize and gather commute, so
    # this is exactly the reference's loss, criterion.py:159, at a fraction of
    # the backward cost).
    up_cost = resize_bilinear(
        jax.lax.stop_gradient(layer_out["pred_masks"])[..., None].astype(
            jnp.float32
        ),
        Ht, Wt, align_corners=False,
    )[..., 0]  # (T, B, Nq, Ht, Wt)

    assign = hungarian_match(layer_out, targets, up_cost, cfg.costs)  # (B, N)

    num_masks = jnp.maximum(T * valid.sum(), 1.0)

    losses = {}

    # ---- masks (reference criterion.py:142-168)
    src_small = _take_queries(
        layer_out["pred_masks"].astype(jnp.float32), assign
    )  # (T, B, N, h4, w4)
    src_masks = resize_bilinear(
        src_small[..., None], Ht, Wt, align_corners=False
    )[..., 0]  # (T, B, N, Ht, Wt)
    tgt_masks = targets["masks"].astype(jnp.float32)
    w = jnp.broadcast_to(valid[None], (T, B, N)).reshape(-1)
    sm = src_masks.reshape(T * B * N, Ht * Wt)
    tm = tgt_masks.reshape(T * B * N, Ht * Wt)
    losses["loss_sigmoid_focal"] = sigmoid_focal_loss(sm, tm, num_masks, weight=w)
    losses["loss_dice"] = dice_loss(sm, tm, num_masks, weight=w)

    # ---- boxes (reference criterion.py:115-140)
    src_boxes = _take_queries(layer_out["pred_boxes"].astype(jnp.float32), assign)
    tgt_boxes = targets["boxes"].astype(jnp.float32)
    l1 = jnp.abs(src_boxes - tgt_boxes).sum(-1) * w.reshape(T, B, N)
    losses["loss_bbox"] = l1.sum() / num_masks
    from ..utils.boxes import box_cxcywh_to_xyxy, generalized_box_iou

    pb = box_cxcywh_to_xyxy(src_boxes).reshape(-1, 1, 4)
    tb = box_cxcywh_to_xyxy(tgt_boxes).reshape(-1, 1, 4)
    giou = generalized_box_iou(pb, tb)[:, 0, 0]  # diagonal pairs
    losses["loss_giou"] = ((1.0 - giou) * w).sum() / num_masks

    # ---- class (reference criterion.py:170-216)
    ref_idx = targets["referred_instance_idx"].astype(jnp.int32)  # (B,)
    q_ref = jnp.take_along_axis(assign, ref_idx[:, None], axis=1)[:, 0]  # (B,)
    ref_valid = jnp.take_along_axis(valid, ref_idx[:, None], axis=1)[:, 0]
    vis_ref = jnp.take_along_axis(
        targets["is_ref_inst_visible"].astype(jnp.float32),
        jnp.broadcast_to(ref_idx[None, :, None], (T, B, 1)), axis=2,
    )[..., 0]  # (T, B)
    if cfg.num_classes == 1:
        lbl = jnp.zeros((B,), jnp.int32)
    else:
        lbl = jnp.take_along_axis(
            targets["labels"].astype(jnp.int32), ref_idx[:, None], axis=1
        )[:, 0]
    pred = layer_out["pred_cls"].astype(jnp.float32).transpose(1, 0, 2, 3)
    pred = pred.reshape(B, T * Nq, K)
    pos = jnp.arange(T)[None, :] * Nq + jnp.clip(q_ref, 0)[:, None]  # (B, T)
    indicator = jax.nn.one_hot(pos, T * Nq)  # (B, T, T*Nq)
    gate = (vis_ref.T * ref_valid[:, None])[..., None]  # (B, T, 1)
    indicator = (indicator * gate).sum(1)  # (B, T*Nq)
    onehot = indicator[..., None] * jax.nn.one_hot(lbl, K)[:, None, :]
    x = pred
    p = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0) - x * onehot + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    focal = (0.25 * onehot + 0.75 * (1 - onehot)) * ce * (1 - p_t) ** 2
    loss_cls = focal.mean(1).sum() / num_masks * (T * Nq)
    losses["loss_cls"] = loss_cls

    # ---- visual-linguistic contrastive (reference criterion.py:86-113)
    if cfg.use_vl_loss:
        logit = layer_out["pred_logit"].astype(jnp.float32)  # (B, Nq, C)
        Cd = logit.shape[-1]
        txt = layer_out["text_sentence_feature"].astype(jnp.float32)  # (B, C)
        sim = jnp.einsum("bqc,bc->bq", logit / Cd, txt)
        logsm = jax.nn.log_softmax(sim, axis=-1)
        picked = jnp.take_along_axis(
            logsm, jnp.clip(q_ref, 0)[:, None], axis=1
        )[:, 0]
        losses["loss_con"] = -(picked * ref_valid).mean()
    return losses


def compute_criterion(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: CriterionConfig,
) -> Dict[str, jnp.ndarray]:
    """outputs: SOC's stacked-over-layers dict. Returns flat loss dict with
    `_i`-suffixed aux entries like the reference."""
    Lyr = outputs["pred_masks"].shape[0]
    losses: Dict[str, jnp.ndarray] = {}
    shared = {"text_sentence_feature": outputs["text_sentence_feature"]}

    def layer_slice(lvl):
        d = {k: outputs[k][lvl] for k in
             ("pred_masks", "pred_cls", "pred_boxes", "pred_logit")}
        d.update(shared)
        return d

    losses.update(_layer_losses(layer_slice(Lyr - 1), targets, cfg))
    if cfg.aux_loss:
        for i in range(Lyr - 1):
            aux = _layer_losses(layer_slice(i), targets, cfg)
            losses.update({f"{k}_{i}": v for k, v in aux.items()})
    return losses


def total_loss(losses: Dict[str, jnp.ndarray], cfg: CriterionConfig) -> jnp.ndarray:
    base = {
        "loss_con": cfg.weight_con,
        "loss_cls": cfg.weight_cls,
        "loss_sigmoid_focal": cfg.weight_focal,
        "loss_dice": cfg.weight_dice,
        "loss_bbox": cfg.weight_bbox,
        "loss_giou": cfg.weight_giou,
    }
    tot = jnp.zeros((), jnp.float32)
    for k, v in losses.items():
        root = k
        for suffix in range(10):
            if root.endswith(f"_{suffix}"):
                root = root[: -len(f"_{suffix}")]
        if root in base:
            tot = tot + base[root] * v
    return tot
