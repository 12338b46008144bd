"""Optimizer: AdamW with the reference's 3 learning-rate groups and
MultiStepLR decay (reference trainer.py:91-106), plus masks for frozen
parameters (text encoder when freeze_text_encoder, FrozenBN stats).

Groups by parameter path:
  backbone.*                 -> lr_backbone
  text_encoder.*             -> text_encoder_lr (or frozen)
  everything else            -> lr
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
) -> optax.GradientTransformation:
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
        return optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
    return tx
