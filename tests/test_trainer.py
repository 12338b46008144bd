"""Trainer orchestration: one epoch on synthetic data, checkpoint save/prune,
resume, and log.txt writing."""
import json
from pathlib import Path

import numpy as np
import pytest

from neurips2023_soc_tpu.config import load_config
from neurips2023_soc_tpu.data.synthetic import SyntheticRVOSDataset
from neurips2023_soc_tpu.data.collate import collate_batch
from neurips2023_soc_tpu.models.text_encoder import build_tokenizer
from neurips2023_soc_tpu.training.trainer import Trainer

SIZE = ((48, 64),)
TIME = (4,)


def make_trainer(tmp_path, epochs=1):
    cfg = load_config("configs/tiny_synthetic.yaml", overrides={
        "epochs": epochs, "output_dir": str(tmp_path), "batch_size": 2,
        "num_samples": 4,
    })
    ds = SyntheticRVOSDataset(num_samples=4, num_frames=4, frame_size=(48, 64))
    tok = build_tokenizer("roberta-tiny", text_bucket=12)

    def train_batches(epoch):
        for start in range(0, len(ds), 2):
            yield collate_batch([ds[start], ds[start + 1]], tok,
                                size_buckets=SIZE, time_buckets=TIME)

    return Trainer(cfg, train_batches, steps_per_epoch=2), ds


def test_trainer_epoch_checkpoints_and_logs(tmp_path):
    trainer, _ = make_trainer(tmp_path, epochs=2)
    trainer.train()
    ckpts = sorted((tmp_path / "checkpoints").glob("epoch_*"))
    assert len(ckpts) == 2
    log = (tmp_path / "log.txt").read_text().strip().splitlines()
    assert len(log) == 2
    rec = json.loads(log[-1])
    assert rec["epoch"] == 1 and np.isfinite(rec["train_loss"])
    assert (tmp_path / "checkpoints" / "best.json").exists()


def test_trainer_ytvos_per_epoch_eval(tmp_path):
    """The per-epoch Ref-YTVOS eval hook runs valid-split inference inside
    the training loop and leaves only the submission zip behind (reference
    trainer.py:315-354)."""
    import zipfile

    from neurips2023_soc_tpu.config import load_config
    from neurips2023_soc_tpu.evaluators import build_ytvos_evaluator

    cfg = load_config("configs/tiny_synthetic.yaml", overrides={
        "epochs": 1, "output_dir": str(tmp_path), "batch_size": 2,
        "eval_short_size": 48, "eval_max_size": 64,
        "eval_time_buckets": (4,), "text_bucket": 12,
    })
    ds = SyntheticRVOSDataset(num_samples=4, num_frames=4, frame_size=(48, 64))
    tok = build_tokenizer("roberta-tiny", text_bucket=12)

    def train_batches(epoch):
        for start in range(0, len(ds), 2):
            yield collate_batch([ds[start], ds[start + 1]], tok,
                                size_buckets=SIZE, time_buckets=TIME)

    rng = np.random.RandomState(3)
    valid_ds = [
        {
            "frames": rng.randn(4, 48, 64, 3).astype(np.float32),
            "text": f"object {i}",
            "video_metadata": {
                "video_id": f"vid{i}", "exp_id": "0",
                "frame_indices": ["00000", "00005", "00010", "00015"],
                "resized_frame_size": (48, 64),
                "original_frame_size": (96, 128),
            },
        }
        for i in range(2)
    ]
    trainer = Trainer(cfg, train_batches, steps_per_epoch=2)
    trainer.evaluate_fn = build_ytvos_evaluator(trainer.model, cfg,
                                                dataset=valid_ds)
    trainer.train()

    zpath = tmp_path / "validation_outputs" / "submission_epoch_0.zip"
    assert zpath.exists()
    names = zipfile.ZipFile(zpath).namelist()
    assert "Annotations/vid0/0/00000.png" in names
    assert "Annotations/vid1/0/00015.png" in names
    assert len(names) == 8
    # uncompressed tree removed after zipping (reference trainer.py:350)
    assert not (tmp_path / "validation_outputs" / "epoch_0").exists()
    rec = json.loads((tmp_path / "log.txt").read_text().strip().splitlines()[-1])
    assert rec["eval_submission_zip"] == str(zpath)


def test_trainer_resume(tmp_path):
    trainer, _ = make_trainer(tmp_path, epochs=1)
    trainer.train()
    step_after = int(trainer._state.step)

    trainer2, _ = make_trainer(tmp_path, epochs=2)
    first = next(iter(trainer2.train_batches(0)))
    trainer2.load_checkpoint(sample_batch=first)
    assert trainer2.epoch == 1
    assert int(trainer2._state.step) == step_after
    p_before = trainer._state.params["params"]["controller"]
    p_restored = trainer2._state.params["params"]["controller"]
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(p_before),
                    jax.tree_util.tree_leaves(p_restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mesh_shrink_fails_hard_without_opt_in(tmp_path):
    """batch_size not divisible by the device count must raise (an 8-chip
    reservation silently training on fewer chips is a silent throughput
    loss); allow_idle_devices: true restores the shrink-with-warning."""
    from neurips2023_soc_tpu.config import load_config

    cfg = load_config("configs/tiny_synthetic.yaml", overrides={
        "output_dir": str(tmp_path), "batch_size": 3,
    })
    cfg = cfg.replace(allow_idle_devices=False)
    with pytest.raises(ValueError, match="allow_idle_devices"):
        Trainer(cfg, lambda e: iter(()), steps_per_epoch=1)
    # opt-in shrinks to the largest divisor instead
    t = Trainer(cfg.replace(allow_idle_devices=True), lambda e: iter(()),
                steps_per_epoch=1)
    assert t.mesh.devices.size == 3


def test_trainer_resume_from_explicit_path(tmp_path):
    """resume_train honors an explicit checkpoint path (reference main.py:26
    `trainer.load_checkpoint(config.checkpoint_path)`) — both an epoch dir
    and a checkpoints root — while NEW checkpoints keep saving under the
    current run's output_dir."""
    run_a = tmp_path / "runA"
    trainer, _ = make_trainer(run_a, epochs=1)
    trainer.train()
    step_after = int(trainer._state.step)

    trainer2, _ = make_trainer(tmp_path / "runB", epochs=2)
    first = next(iter(trainer2.train_batches(0)))
    trainer2.load_checkpoint(sample_batch=first,
                             path=str(run_a / "checkpoints" / "epoch_0000"))
    assert trainer2.epoch == 1
    assert int(trainer2._state.step) == step_after

    trainer3, _ = make_trainer(tmp_path / "runC", epochs=2)
    first = next(iter(trainer3.train_batches(0)))
    trainer3.load_checkpoint(sample_batch=first,
                             path=str(run_a / "checkpoints"))
    assert int(trainer3._state.step) == step_after
    assert trainer3.ckpt.dir == tmp_path / "runC" / "checkpoints"


def test_load_weights_and_torch_resume(tmp_path):
    """-rm test/pred load checkpoint_path as MODEL WEIGHTS (reference
    main.py:29-43), including the torch zoo .pth.tar format; resume_train
    from a torch file restores the epoch/best metadata it carries."""
    import jax

    from neurips2023_soc_tpu.training.checkpoint import (
        save_reference_checkpoint,
    )

    trainer, _ = make_trainer(tmp_path / "a", epochs=1)
    first = next(iter(trainer.train_batches(0)))
    trainer.init_state(first)
    pth = str(tmp_path / "ref.pth.tar")
    save_reference_checkpoint(trainer._state.params, pth, epoch=3,
                              best_loss=1.5)

    trainer2, _ = make_trainer(tmp_path / "b", epochs=1)
    trainer2.load_weights(pth, sample_batch=first)
    for a, b in zip(jax.tree_util.tree_leaves(trainer._state.params),
                    jax.tree_util.tree_leaves(trainer2._state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    trainer3, _ = make_trainer(tmp_path / "c", epochs=5)
    trainer3.load_checkpoint(sample_batch=first, path=pth)
    assert trainer3.epoch == 4
    assert trainer3.best_loss == 1.5
    for a, b in zip(jax.tree_util.tree_leaves(trainer._state.params),
                    jax.tree_util.tree_leaves(trainer3._state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_weights_strict_rejects_unexpected_keys(tmp_path):
    """strict=True mirrors the reference's load_state_dict(strict=True)
    (main.py:28-43): a checkpoint with EXTRA keys must raise, not silently
    evaluate with the extras ignored; strict=False loads and prints."""
    import pytest
    import torch

    from neurips2023_soc_tpu.training.checkpoint import (
        save_reference_checkpoint,
    )

    trainer, _ = make_trainer(tmp_path / "a", epochs=1)
    first = next(iter(trainer.train_batches(0)))
    trainer.init_state(first)
    pth = str(tmp_path / "superset.pth.tar")
    save_reference_checkpoint(trainer._state.params, pth, epoch=0)
    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    ckpt["model_state_dict"]["not.a.real.key"] = torch.zeros(3)
    torch.save(ckpt, pth)

    trainer2, _ = make_trainer(tmp_path / "b", epochs=1)
    with pytest.raises(ValueError, match="not.a.real.key"):
        trainer2.load_weights(pth, sample_batch=first)
    trainer2.load_weights(pth, sample_batch=first, strict=False)


def test_load_params_from_checkpoints_root(tmp_path):
    """An infer CLI pointed at a CheckpointManager ROOT resolves to the best
    (else latest) epoch — the orbax analog of the zoo's best.pth.tar."""
    import jax

    from neurips2023_soc_tpu.training.checkpoint import load_params_from_path

    trainer, _ = make_trainer(tmp_path, epochs=1)
    trainer.train()
    params, report = load_params_from_path(str(tmp_path / "checkpoints"),
                                           trainer._state.params)
    assert report == {"missing": [], "unused": []}
    for a, b in zip(jax.tree_util.tree_leaves(trainer._state.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
