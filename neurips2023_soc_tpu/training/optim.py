"""Optimizer: AdamW with the reference's 3 learning-rate groups and
MultiStepLR decay (reference trainer.py:91-106), plus masks for frozen
parameters (text encoder when freeze_text_encoder, FrozenBN stats).

Groups by parameter path:
  backbone.*                 -> lr_backbone
  text_encoder.*             -> text_encoder_lr (or frozen)
  everything else            -> lr

The joint trainer's extra "VLA" keyword split (reference
jointtrainer.py:84-91: params with "VLA" in their name forced into the
main-lr group and excluded from the backbone group) is intentionally NOT a
separate code path here: in the reference model no parameter name contains
the string "VLA" — the fusion modules are the attributes `vlf`/`lvf` on SOC
(reference models/soc.py:120-121), so `"VLA" in n` never matches and the
joint trainer degenerates to the same 3-group split as trainer.py:91-99.
Our vlf/lvf fusion params land in the "main" group, which is exactly the
behavior the reference's (dead) keyword was trying to guarantee;
test_training.py::test_vla_fusion_params_in_main_group pins this.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import optax


def _label_tree(params, freeze_text: bool):
    def label(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(k) for k in keys)
        if "frozen_bn" in joined:
            return "frozen"
        if joined.startswith("params/backbone") or "/backbone/" in joined:
            return "backbone"
        if "text_encoder" in joined:
            return "frozen" if freeze_text else "text"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def update_milestones_from_microsteps(
        milestones_steps: Sequence[int], grad_accum_steps: int) -> list:
    """Convert micro-step lr milestones to optimizer-update units.

    Floor division by the accum factor can collide two distinct milestones
    onto one update count (losing a gamma drop in the schedule dict) or
    floor to 0 (dropping the lr from the very first update); keep every
    drop by clamping to >=1 and forcing strict increase."""
    k = max(1, int(grad_accum_steps))
    out: list = []
    for m in milestones_steps:
        u = max(1, int(m) // k)
        if out and u <= out[-1]:
            u = out[-1] + 1
        out.append(u)
    return out


def multistep_schedule(base_lr: float, milestones_steps: Sequence[int],
                       gamma: float) -> optax.Schedule:
    if not milestones_steps:
        return optax.constant_schedule(base_lr)
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones_steps}
    )


def build_optimizer(
    params,
    lr: float,
    lr_backbone: float,
    text_encoder_lr: float,
    weight_decay: float = 1e-4,
    clip_max_norm: float = 0.1,
    milestones_steps: Sequence[int] = (),
    gamma: float = 0.1,
    freeze_text: bool = True,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """grad_accum_steps > 1 accumulates (means) that many micro-batch
    gradients before one clipped AdamW update (optax.MultiSteps) — how a
    small mesh reproduces the reference's 8-GPU global batch of 8
    (reference README.md:167-172) without 8 chips. The clip-by-global-norm
    applies to the averaged gradient at the update, where the reference
    clips its full-batch DDP gradient (trainer.py:193-197).

    Semantics note (standard grad-accumulation approximation): each
    micro-batch's loss is normalized by its OWN num_masks (the per-step
    global sum under pjit, losses/criterion.py), then gradients are
    averaged — whereas one big DDP step divides by the single all-reduced
    num_masks. The two coincide when micro-batches carry equal
    visible-instance counts and differ (low-count micro-batches up-weighted)
    when they don't; this matches how grad accumulation is conventionally
    defined everywhere, but it is an approximation of the reference's
    one-step normalization, not an exact reproduction.

    `milestones_steps` are in OPTIMIZER-UPDATE units: when accumulating,
    the caller converts micro-step milestones (training/trainer.py divides
    by grad_accum_steps, keeping the drops strictly increasing)."""
    def adamw(base):
        return optax.adamw(
            multistep_schedule(base, milestones_steps, gamma),
            weight_decay=weight_decay,
        )

    labels = _label_tree(params, freeze_text)
    tx = optax.multi_transform(
        {
            "main": adamw(lr),
            "backbone": adamw(lr_backbone),
            "text": adamw(text_encoder_lr),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if clip_max_norm and clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
    if int(grad_accum_steps) > 1:
        # non-final micro-steps emit zero updates (params untouched); the
        # accumulator is a params-shaped pytree that ZeRO-1 shards like any
        # other optimizer-state leaf (parallel/zero.py tree_maps all leaves)
        tx = optax.MultiSteps(tx, every_k_schedule=int(grad_accum_steps))
    return tx
