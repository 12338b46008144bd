"""Trainer orchestration (reference trainer.py:33-428, TPU-native).

One process drives the whole mesh (single-controller JAX replaces the
reference's one-process-per-GPU torch.multiprocessing design): batches are
sharded over the mesh's `data` axis, the jitted train step does forward /
criterion / clipped-AdamW update with XLA inserting the gradient all-reduce.

Matches the reference's observable behaviors:
  * 3 lr groups + MultiStepLR (gamma 0.2 for A2D, 0.1 otherwise, trainer.py:101-106)
  * non-finite loss aborts (trainer.py:186-189)
  * eval every epoch; best checkpoint by mAP (A2D) / lowest train loss (YTVOS)
  * keep at most 5 epoch checkpoints (+ best) (trainer.py:380-422)
  * JSON-lines log.txt per epoch (trainer.py:243-244)
"""
from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from ..losses import build_criterion_config
from ..models import build_model
from ..parallel import make_mesh, shard_batch
from .checkpoint import CheckpointManager, load_pretrained_into_params
from .optim import build_optimizer
from .train_step import TrainState, make_forward_fn, make_train_step


class Trainer:
    def __init__(
        self,
        config,
        train_batches: Callable[[int], Iterable[Dict]],
        steps_per_epoch: int,
        evaluate_fn: Optional[Callable] = None,
        mesh=None,
    ):
        """train_batches(epoch) yields host batch dicts (see data/collate.py);
        evaluate_fn(forward, params, epoch) -> metrics dict."""
        self.config = config
        if mesh is None:
            # data-axis size must divide the global batch; use the largest
            # divisor of batch_size that fits the device count
            n_dev = len(jax.devices())
            bs = int(config.batch_size)
            n = max(d for d in range(1, n_dev + 1) if bs % d == 0 or d == 1)
            while bs % n != 0:
                n -= 1
            mesh = make_mesh(shape=(n,), axis_names=("data",),
                             devices=jax.devices()[:n])
        self.mesh = mesh
        self.model = build_model(config)
        self.crit_cfg = build_criterion_config(config)
        self.train_batches = train_batches
        self.steps_per_epoch = steps_per_epoch
        self.evaluate_fn = evaluate_fn

        self.dataset_name = config.dataset_name
        self.total_epochs = config.epochs
        self.epoch = 0
        self.best_map = 0.0
        self.best_loss = math.inf

        out_dir = config.get("output_dir") or f"outputs/{config.dataset_name}"
        self.output_dir = Path(out_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.ckpt = CheckpointManager(self.output_dir / "checkpoints", max_keep=5)

        gamma = 0.2 if self.dataset_name == "a2d_sentences" else 0.1
        milestones = config.get("lr_drop", []) or []
        self.milestones_steps = [int(m) * steps_per_epoch for m in milestones]
        self.gamma = gamma
        self._state = None
        self._train_step = None
        self._forward = None

        # optional wandb (reference trainer.py:113-114); package is not in the
        # TPU image so this is gated
        self._wandb = None
        if config.get("wandb_mode") == "online":
            try:
                import wandb

                wandb.init(project="RefVOS", config=config.to_dict(),
                           name="SOC_TPU")
                self._wandb = wandb
            except ImportError:
                print("wandb requested but not installed; logging to log.txt only")

    # ---------------- state / jit setup ----------------
    def init_state(self, sample_batch: Dict):
        model = self.model
        params = jax.jit(model.init)(
            jax.random.PRNGKey(self.config.seed),
            sample_batch["pixels"], sample_batch["pad_mask"],
            sample_batch["text_ids"], sample_batch["text_mask"],
        )
        if self.config.get("pretrained_weights"):
            params, report = load_pretrained_into_params(
                self.config.pretrained_weights, params,
                drop_class_embed=bool(self.config.get("drop_class_embed", False)),
            )
            print(f"loaded pretrained weights: {len(report['missing'])} missing, "
                  f"{len(report['unused'])} unused")
        tx = build_optimizer(
            params,
            lr=float(self.config.lr),
            lr_backbone=float(self.config.lr_backbone),
            text_encoder_lr=float(self.config.text_encoder_lr),
            weight_decay=float(self.config.weight_decay),
            clip_max_norm=float(self.config.clip_max_norm),
            milestones_steps=self.milestones_steps,
            gamma=self.gamma,
            freeze_text=bool(self.config.freeze_text_encoder),
        )
        self._state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        has_valid = self.dataset_name in ("a2d_sentences", "jhmdb_sentences")
        self._train_step = make_train_step(
            model, self.crit_cfg, has_valid_indices=has_valid
        )
        self._forward = make_forward_fn(model)

    # ---------------- training ----------------
    def train(self):
        print("Training started...")
        rng = jax.random.PRNGKey(self.config.seed + 1)
        for self.epoch in range(self.epoch, self.total_epochs):
            t_epoch = time.time()
            epoch_loss = 0.0
            n = 0
            log_every = 10
            for i, batch in enumerate(self.train_batches(self.epoch)):
                if self._state is None:
                    self.init_state(batch)
                batch = shard_batch(self.mesh, batch)
                rng, step_rng = jax.random.split(rng)
                self._state, metrics = self._train_step(self._state, batch, step_rng)
                loss = float(metrics["loss"])
                if not math.isfinite(loss):
                    print(f"Loss is {loss}, stopping training")
                    sys.exit(1)
                epoch_loss += loss
                n += 1
                if i % log_every == 0:
                    print(f"epoch {self.epoch} step {i}/{self.steps_per_epoch} "
                          f"loss {loss:.4f} grad_norm {float(metrics['grad_norm']):.3f}")

            log_stats = {
                "epoch": self.epoch,
                "train_loss": epoch_loss / max(n, 1),
                "epoch_time_s": time.time() - t_epoch,
            }

            eval_metrics = {}
            if self.evaluate_fn is not None:
                eval_metrics = self.evaluate_fn(
                    self._forward, self._state.params, self.epoch
                )
                log_stats.update({f"eval_{k}": v for k, v in eval_metrics.items()})

            is_best = self._update_best(eval_metrics, epoch_loss)
            self.save_checkpoint(is_best, log_stats)
            with open(self.output_dir / "log.txt", "a") as f:
                f.write(json.dumps(log_stats) + "\n")
            if self._wandb is not None:
                self._wandb.log(log_stats)

    def _update_best(self, eval_metrics: Dict, epoch_loss: float) -> bool:
        if self.dataset_name == "a2d_sentences":
            m = eval_metrics.get("mAP 0.5:0.95", 0.0) or 0.0
            if m > self.best_map:
                self.best_map = m
                return True
            return False
        if epoch_loss < self.best_loss:
            self.best_loss = epoch_loss
            return True
        return False

    # ---------------- checkpointing ----------------
    def save_checkpoint(self, is_best: bool, extra: Dict):
        state = {
            "params": self._state.params,
            "opt_state": self._state.opt_state,
            "step": np.asarray(self._state.step),
        }
        self.ckpt.save(self.epoch, state, is_best,
                       extra={k: v for k, v in extra.items()
                              if isinstance(v, (int, float, str))})

    def load_checkpoint(self, epoch: Optional[int] = None, sample_batch=None):
        if self._state is None:
            assert sample_batch is not None
            self.init_state(sample_batch)
        epoch = epoch if epoch is not None else self.ckpt.latest_epoch()
        assert epoch is not None, "no checkpoint found"
        target = {
            "params": self._state.params,
            "opt_state": self._state.opt_state,
            "step": np.asarray(self._state.step),
        }
        restored = self.ckpt.restore(epoch, target)
        self._state = self._state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )
        self.epoch = epoch + 1
