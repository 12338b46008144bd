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
from ..parallel import make_mesh, shard_batch, shard_opt_state
from .checkpoint import CheckpointManager, load_pretrained_into_params
from .optim import build_optimizer, update_milestones_from_microsteps
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
            if n < n_dev:
                msg = (
                    f"batch_size={bs} is not divisible by the {n_dev} "
                    f"available devices — training would use {n} device(s) "
                    f"and leave {n_dev - n} idle. Raise batch_size to a "
                    f"multiple of {n_dev}, or set allow_idle_devices: true "
                    "to accept the shrunken mesh.")
                # fail hard by default: an 8-chip reservation silently
                # training on 6 chips is a silent 25% throughput loss
                if not config.get("allow_idle_devices", False):
                    raise ValueError(msg)
                print("WARNING: " + msg)
            mesh = make_mesh(shape=(n,), axis_names=("data",),
                             devices=jax.devices()[:n])
        self.mesh = mesh
        self.model = build_model(config)
        self.crit_cfg = build_criterion_config(config)
        self.train_batches = train_batches
        self.steps_per_epoch = steps_per_epoch
        self.evaluate_fn = evaluate_fn

        self.dataset_name = config.dataset_name
        self._is_pretrain = self.dataset_name in ("coco", "coco_refer")
        self.total_epochs = config.epochs
        self.epoch = 0
        self.best_map = 0.0
        self.best_loss = math.inf

        out_dir = config.get("output_dir") or f"outputs/{config.dataset_name}"
        self.output_dir = Path(out_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        # the pretrainer retains 10 checkpoints, the trainers 5 (reference
        # pretrainer.py:340-345 vs trainer.py:414-420)
        max_keep = 10 if self._is_pretrain else 5
        self.ckpt = CheckpointManager(self.output_dir / "checkpoints",
                                      max_keep=max_keep)

        gamma = 0.2 if self.dataset_name == "a2d_sentences" else 0.1
        milestones = config.get("lr_drop", []) or []
        self.milestones_steps = [int(m) * steps_per_epoch for m in milestones]
        self.gamma = gamma
        # parsed once; init_state (optimizer layout) and load_checkpoint
        # (re-placement after orbax restore) must always agree on it
        self._zero1 = str(config.get("optimizer_sharding",
                                     "replicated")).lower() == "zero1"
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
        # grad_accum_steps: micro-batches averaged per optimizer update —
        # effective global batch = batch_size * grad_accum_steps (how fewer
        # chips reproduce the reference's 8-GPU bs=8 finetune shape).
        # lr milestones are epoch-derived micro-step counts; the inner
        # schedule ticks once per UPDATE (collision-safe conversion keeps
        # every gamma drop — optim.update_milestones_from_microsteps)
        accum = int(self.config.get("grad_accum_steps", 1) or 1)
        update_milestones = update_milestones_from_microsteps(
            self.milestones_steps, accum)
        tx = build_optimizer(
            params,
            lr=float(self.config.lr),
            lr_backbone=float(self.config.lr_backbone),
            text_encoder_lr=float(self.config.text_encoder_lr),
            weight_decay=float(self.config.weight_decay),
            clip_max_norm=float(self.config.clip_max_norm),
            milestones_steps=update_milestones,
            gamma=self.gamma,
            freeze_text=bool(self.config.freeze_text_encoder),
            grad_accum_steps=accum,
        )
        self._state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        # optimizer_sharding: 'zero1' shards the AdamW mu/nu over the data
        # mesh (parallel/zero.py) — 1/N of the state per chip vs the
        # reference's full per-rank torch.optim replica (trainer.py:91-99)
        if self._zero1:
            self._state = shard_opt_state(self._state, self.mesh)
        has_valid = self.dataset_name in ("a2d_sentences", "jhmdb_sentences")
        self._train_step = make_train_step(
            model, self.crit_cfg, has_valid_indices=has_valid,
            zero1_mesh=self.mesh if self._zero1 else None,
        )
        self._forward = make_forward_fn(model)

    def _current_lr(self) -> float:
        """Display lr after MultiStepLR drops (mirrors optimizer schedule)."""
        step = int(self._state.step) if self._state is not None else 0
        drops = sum(1 for m in self.milestones_steps if step >= m)
        return float(self.config.lr) * (self.gamma ** drops)

    # ---------------- training ----------------
    def train(self):
        """Per-step telemetry matches the reference's MetricLogger loop
        (reference misc.py:327-379): window-smoothed loss/grad_norm, current
        lr, step/data time split and ETA, epoch summary to log.txt. Setting
        config.profile_steps=N wraps steps [1, N] of the first epoch in a
        jax.profiler trace written under output_dir/profile."""
        from ..utils.logging import MetricLogger, SmoothedValue, profile_trace
        from ..utils.prefetch import prefetch

        print("Training started...")
        rng = jax.random.PRNGKey(self.config.seed + 1)
        profile_steps = int(self.config.get("profile_steps", 0) or 0)
        for self.epoch in range(self.epoch, self.total_epochs):
            t_epoch = time.time()
            epoch_loss = 0.0
            n = 0
            log_every = 10
            mlog = MetricLogger()
            iter_time = SmoothedValue(fmt="{avg:.4f}")
            data_time = SmoothedValue(fmt="{avg:.4f}")
            end = time.perf_counter()
            prof = None
            # decode/collate the next batch while the chip runs this step
            for i, batch in enumerate(prefetch(self.train_batches(self.epoch))):
                data_time.update(time.perf_counter() - end)
                if self._state is None:
                    self.init_state(batch)
                if profile_steps and self.epoch == 0 and i == 1:
                    prof = profile_trace(str(self.output_dir / "profile"))
                    prof.__enter__()
                batch = shard_batch(self.mesh, batch)
                rng, step_rng = jax.random.split(rng)
                self._state, metrics = self._train_step(self._state, batch, step_rng)
                loss = float(metrics["loss"])  # blocks: host sync per step
                if not math.isfinite(loss):
                    print(f"Loss is {loss}, stopping training")
                    sys.exit(1)
                if prof is not None and i == profile_steps:
                    prof.__exit__(None, None, None)
                    prof = None
                epoch_loss += loss
                n += 1
                mlog.update(loss=loss, grad_norm=float(metrics["grad_norm"]),
                            lr=self._current_lr())
                iter_time.update(time.perf_counter() - end)
                if i % log_every == 0:
                    eta = int(iter_time.avg * max(self.steps_per_epoch - i, 0))
                    print(f"Epoch: [{self.epoch}] [{i}/{self.steps_per_epoch}] "
                          f"eta: {eta}s {mlog} "
                          f"time: {iter_time} data: {data_time}", flush=True)
                end = time.perf_counter()
            if prof is not None:  # epoch shorter than profile_steps
                prof.__exit__(None, None, None)

            log_stats = {
                "epoch": self.epoch,
                "train_loss": epoch_loss / max(n, 1),
                "epoch_time_s": time.time() - t_epoch,
                "step_time_s": iter_time.global_avg,
                "data_time_s": data_time.global_avg,
                "lr": self._current_lr(),
            }

            eval_metrics = {}
            if self.evaluate_fn is not None:
                eval_metrics = self.evaluate_fn(
                    self._forward, self._state.params, self.epoch
                )
                log_stats.update({f"eval_{k}": v for k, v in eval_metrics.items()})

            is_best = self._update_best(eval_metrics, epoch_loss)
            self.save_checkpoint(is_best, log_stats)
            # rank-0-only host writes (reference trainer.py:243-244 gates on
            # is_main_process); orbax saves above stay collective
            from ..parallel.multihost import is_main_process

            if is_main_process():
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
        if self._is_pretrain and "mean_mask_mAP" in eval_metrics:
            # best by mean mask-mAP over the three RefCOCO val splits
            # (reference pretrainer.py:234-238); without val sets the
            # loss fallback below applies ("checkpointing by train loss
            # only", cli/main_pretrain.py)
            m = eval_metrics["mean_mask_mAP"] or 0.0
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
        extra = {k: v for k, v in extra.items()
                 if isinstance(v, (int, float, str))}
        # persist best tracking so resume restores it exactly (reference
        # trainer.py:363-378 reads best_mAP/best_loss back from the ckpt)
        extra["best_map"] = float(self.best_map)
        extra["best_loss"] = float(self.best_loss)
        self.ckpt.save(self.epoch, state, is_best, extra=extra)

    def load_weights(self, path: str, sample_batch=None, strict: bool = True,
                     _loaded_ckpt=None):
        """Load MODEL WEIGHTS from an explicit checkpoint_path — torch zoo
        `.pth.tar` or an orbax checkpoint dir — for `-rm test` / `-rm pred`
        (reference main.py:28-43 loads config.checkpoint_path STRICTLY via
        load_state_dict(strict=True); optimizer state is untouched).

        strict=True raises when the checkpoint is missing any model
        parameter — an incompatible checkpoint must never silently evaluate
        with randomly-initialized weights. strict=False matches the
        reference's inference CLIs (infer_refytb.py:143-156), which print
        missing/unexpected keys and continue."""
        from .checkpoint import load_params_from_path

        if self._state is None:
            assert sample_batch is not None
            self.init_state(sample_batch)
        params, report = load_params_from_path(
            path, self._state.params, loaded_ckpt=_loaded_ckpt)
        if report["missing"] or report["unused"]:
            msg = (f"loaded {path}: {len(report['missing'])} missing, "
                   f"{len(report['unused'])} unused keys")
            if strict:
                # the reference's strict load_state_dict rejects BOTH missing
                # and unexpected keys (main.py:28-43); a superset checkpoint
                # must not silently evaluate with extra weights ignored
                detail = "; ".join(
                    f"{kind}: " + ", ".join(report[kind][:20])
                    + (" ..." if len(report[kind]) > 20 else "")
                    for kind in ("missing", "unused") if report[kind])
                raise ValueError(
                    msg + "; " + detail + " (pass strict=False to load anyway)")
            print(msg)
        self._state = self._state.replace(params=params)

    def load_checkpoint(self, epoch: Optional[int] = None, sample_batch=None,
                        path: Optional[str] = None):
        """Resume training state. With `path` (reference main.py:26
        `trainer.load_checkpoint(config.checkpoint_path)`): an orbax
        epoch dir restores params/opt_state/step + best tracking; a torch
        `.pth.tar` restores weights and the epoch/best metadata it carries
        (the torch optimizer state has no optax equivalent — a note is
        printed). Without `path`: the latest epoch under output_dir."""
        if self._state is None:
            assert sample_batch is not None
            self.init_state(sample_batch)
        if path is not None and str(path).endswith((".pth", ".pth.tar", ".pt")):
            import torch

            # ONE torch.load serves both the weight conversion and the
            # epoch/best metadata (zoo checkpoints are multi-GB)
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
            self.load_weights(path, _loaded_ckpt=ckpt)
            self.epoch = int(ckpt.get("epoch", -1)) + 1
            # reference trainer.load_checkpoint restores total_epochs from
            # the checkpoint when no override is given (trainer.py:365-368);
            # an explicit config.epochs is the override — compare against
            # None so epochs=0 counts as an explicit override too
            if ("total_epochs" in ckpt
                    and getattr(self.config, "epochs", None) is None):
                self.total_epochs = int(ckpt["total_epochs"])
            if "best_mAP" in ckpt:
                self.best_map = float(ckpt["best_mAP"])
            if "best_loss" in ckpt:
                self.best_loss = float(ckpt["best_loss"])
            print("resumed weights from torch checkpoint; optimizer/schedule "
                  "state restarts (no optax equivalent of the torch state)")
            return
        source = self.ckpt  # new checkpoints keep saving under output_dir
        if path is not None:
            p = Path(path)
            # accept either a specific epoch_NNNN dir or the checkpoints root
            # (create=False: a mistyped path fails instead of mkdir-ing it)
            if p.name.startswith("epoch_"):
                source = CheckpointManager(p.parent, max_keep=self.ckpt.max_keep,
                                           create=False)
                epoch = int(p.name.split("_")[1])
            else:
                source = CheckpointManager(p, max_keep=self.ckpt.max_keep,
                                           create=False)
        epoch = epoch if epoch is not None else source.latest_epoch()
        assert epoch is not None, "no checkpoint found"
        target = {
            "params": self._state.params,
            "opt_state": self._state.opt_state,
            "step": np.asarray(self._state.step),
        }
        restored = source.restore(epoch, target)
        self._state = self._state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )
        if self._zero1:
            # orbax restores replicated; re-place in the ZeRO-1 layout so the
            # donated input matches the train step's constrained output
            self._state = shard_opt_state(self._state, self.mesh)
        self.epoch = epoch + 1
        meta = source.read_meta(epoch)
        if meta:  # resume best tracking (reference trainer.py:363-378)
            self.best_map = float(meta.get("best_map", self.best_map))
            self.best_loss = float(meta.get("best_loss", self.best_loss))
