"""Jitted train/eval steps over a device mesh.

The reference's DDP + AMP + GradScaler loop (trainer.py:175-197) becomes one
jitted function: forward -> criterion (on-device matching) -> grad -> clipped
AdamW update. Data parallelism comes from sharding the batch over the mesh's
`data` axis with replicated params; XLA inserts the gradient all-reduce.
bf16 compute needs no loss scaling on TPU.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax
from flax.training import train_state

from ..losses import CriterionConfig, compute_criterion, total_loss

TARGET_KEYS = (
    "masks", "boxes", "labels", "inst_valid", "is_ref_inst_visible",
    "referred_instance_idx",
)


class TrainState(train_state.TrainState):
    pass


def make_train_step(model, crit_cfg: CriterionConfig,
                    has_valid_indices: bool = False, donate: bool = True,
                    zero1_mesh=None):
    """Returns a jitted train_step(state, batch, rng) -> (state, metrics).

    Host-side metadata entries in the collated batch (strings, tuples) are
    stripped before the jit boundary; the state argument is donated.

    zero1_mesh: when given, the new optimizer state is pinned to the ZeRO-1
    layout (AdamW mu/nu sharded over the mesh's 'data' axis,
    parallel/zero.py) so each chip holds 1/N of it; pair with
    `shard_opt_state` on the initial/restored state so the donated input
    and output layouts match."""

    def train_step(state: TrainState, batch: Dict[str, Any], rng):
        def loss_fn(params):
            out = model.apply(
                params,
                batch["pixels"],
                batch["pad_mask"],
                batch["text_ids"],
                batch["text_mask"],
                sample_sizes=batch.get("sample_sizes"),
                valid_indices=batch.get("valid_indices") if has_valid_indices else None,
                training=True,
                rngs={"dropout": rng},
            )
            targets = {k: batch[k] for k in TARGET_KEYS}
            losses = compute_criterion(out, targets, crit_cfg)
            return total_loss(losses, crit_cfg), losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        if zero1_mesh is not None:
            from ..parallel.zero import replicate_constrain, zero1_constrain

            new_state = new_state.replace(
                params=replicate_constrain(new_state.params, zero1_mesh),
                opt_state=zero1_constrain(new_state.opt_state, zero1_mesh))
        metrics = {"loss": loss, **losses}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def step(state, batch, rng):
        return jitted(
            state, {k: v for k, v in batch.items() if hasattr(v, "ndim")}, rng
        )

    return step


def make_forward_fn(model):
    """Inference forward (already jitted): returns the full stacked-output
    dict. Host-side metadata entries (strings, tuples) in the collated batch
    are stripped before the jit boundary."""

    @jax.jit
    def _fwd(params, device_batch):
        return model.apply(
            params,
            device_batch["pixels"],
            device_batch["pad_mask"],
            device_batch["text_ids"],
            device_batch["text_mask"],
            sample_sizes=device_batch.get("sample_sizes"),
            valid_indices=device_batch.get("valid_indices"),
            training=False,
        )

    def forward(params, batch):
        return _fwd(
            params, {k: v for k, v in batch.items() if hasattr(v, "ndim")}
        )

    return forward


def create_train_state(model, tx, sample_batch, rng) -> TrainState:
    params = model.init(
        rng,
        sample_batch["pixels"],
        sample_batch["pad_mask"],
        sample_batch["text_ids"],
        sample_batch["text_mask"],
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)
