"""Checkpoint-loading validation (ADVICE r3): the orbax branch of
load_params_from_path restores with a params-only partial target, validates
against the checkpoint's metadata, and reports missing/unused keys instead
of silently returning wrong or randomly-initialized tensors."""
import numpy as np
import pytest

from neurips2023_soc_tpu.training.checkpoint import (
    CheckpointManager,
    load_params_from_path,
)


@pytest.fixture()
def saved_ckpt(tmp_path):
    params = {
        "params": {
            "layer_a": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4),
                        "bias": np.ones((4,), np.float32)},
            "layer_b": {"kernel": np.full((2, 2), 7.0, np.float32)},
        }
    }
    state = {
        "params": params,
        "opt_state": {"mu": {"x": np.zeros((100,), np.float32)}},
        "step": np.asarray(3),
    }
    mgr = CheckpointManager(tmp_path / "ckpts", max_keep=2)
    mgr.save(0, state, is_best=True, extra={"best_loss": 1.5})
    return tmp_path / "ckpts", params


def test_exact_restore_no_report(saved_ckpt):
    root, params = saved_ckpt
    import jax

    target = jax.tree_util.tree_map(np.zeros_like, params)
    new, report = load_params_from_path(str(root), target)
    assert report == {"missing": [], "unused": []}
    np.testing.assert_array_equal(
        new["params"]["layer_a"]["kernel"],
        params["params"]["layer_a"]["kernel"])
    np.testing.assert_array_equal(
        new["params"]["layer_b"]["kernel"],
        params["params"]["layer_b"]["kernel"])


def test_missing_and_unused_reported_and_target_kept(saved_ckpt):
    """A target leaf absent from the checkpoint (or shape-mismatched) is
    'missing' and KEEPS the caller's value; checkpoint leaves the target
    doesn't want are 'unused'. Nothing silently wrong comes back."""
    root, params = saved_ckpt
    sentinel = np.full((5, 5), -1.0, np.float32)
    target = {
        "params": {
            "layer_a": {"kernel": np.zeros((3, 4), np.float32),
                        # shape mismatch vs saved (4,)
                        "bias": np.zeros((8,), np.float32)},
            "layer_new": {"w": sentinel},  # absent from checkpoint
        }
    }
    new, report = load_params_from_path(str(root), target)
    assert any("layer_new" in m for m in report["missing"])
    assert any("bias" in m for m in report["missing"])
    assert any("layer_b" in u for u in report["unused"])
    # matching leaf restored; missing/mismatched keep the caller's values
    np.testing.assert_array_equal(
        new["params"]["layer_a"]["kernel"],
        params["params"]["layer_a"]["kernel"])
    np.testing.assert_array_equal(new["params"]["layer_new"]["w"], sentinel)
    assert new["params"]["layer_a"]["bias"].shape == (8,)
    assert (new["params"]["layer_a"]["bias"] == 0).all()


def test_missing_path_raises_without_mkdir(tmp_path):
    """ADVICE r3: pointing a load at a mistyped path must raise
    FileNotFoundError and must NOT create a spurious directory tree."""
    bogus = tmp_path / "does" / "not" / "exist"
    with pytest.raises(FileNotFoundError):
        load_params_from_path(str(bogus), {"params": {}})
    assert not bogus.exists()
    with pytest.raises(FileNotFoundError):
        CheckpointManager(bogus, create=False)
    assert not bogus.exists()
