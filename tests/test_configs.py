"""Every shipped config must parse and carry the keys the CLIs read
(regression: configs/refer_youtube_vos.yaml shipped with invalid YAML —
an unquoted `[1..N]` inside a flow mapping — and no test loaded it)."""
from pathlib import Path

import pytest

from neurips2023_soc_tpu.config import load_config

CONFIGS = sorted(Path("configs").glob("*.yaml"))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.stem)
def test_shipped_config_loads(path):
    cfg = load_config(path)
    # keys every entry point dereferences unconditionally
    for key in ("backbone", "compute_dtype", "text_encoder_type",
                "eval_short_size", "eval_max_size", "batch_size", "lr"):
        assert cfg.get(key) is not None, f"{path}: missing {key}"
    assert cfg.compute_dtype in ("bfloat16", "float32")
    assert cfg.get("msda_impl", "auto") in ("auto", "xla", "pallas")


def test_all_configs_discovered():
    assert len(CONFIGS) == 7  # keep in sync when adding a config
