"""Config system (L7): YAML files of ``{key: {desc, value}}`` flattened to a
single attribute namespace and overridable from the CLI — same surface as the
reference (main.py:17-21), backed by pyyaml instead of ruamel.

Usage:
    cfg = load_config("configs/refer_youtube_vos.yaml", overrides={"lr": 2e-4})
    cfg.lr, cfg.DeformTransformer["d_model"], ...
"""
from __future__ import annotations

import argparse
import copy
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import yaml


class Config:
    """Attribute-style view over a plain dict (nested dicts stay dicts)."""

    def __init__(self, data: Dict[str, Any]):
        object.__setattr__(self, "_data", dict(data))

    def __getattr__(self, k: str) -> Any:
        try:
            return self._data[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k: str, v: Any) -> None:
        self._data[k] = v

    def __contains__(self, k: str) -> bool:
        return k in self._data

    def get(self, k: str, default: Any = None) -> Any:
        return self._data.get(k, default)

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self._data)

    def replace(self, **kwargs: Any) -> "Config":
        d = self.to_dict()
        d.update(kwargs)
        return Config(d)

    def __repr__(self) -> str:
        return f"Config({self._data!r})"


def _flatten_yaml(raw: Mapping[str, Any]) -> Dict[str, Any]:
    """{key: {desc, value}} -> {key: value}; bare values pass through."""
    out: Dict[str, Any] = {}
    for k, v in raw.items():
        if isinstance(v, Mapping) and "value" in v:
            out[k] = v["value"]
        else:
            out[k] = v
    return out


def load_config(
    path: str | Path,
    overrides: Optional[Mapping[str, Any]] = None,
) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f)
    data = _flatten_yaml(raw or {})
    if overrides:
        for k, v in overrides.items():
            if v is not None:
                data[k] = v
    return Config(data)


def add_config_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Common CLI flags shared by all entry points (reference main.py:61-97)."""
    parser.add_argument("--config_path", "-c", required=True)
    parser.add_argument("--running_mode", "-rm", default="train",
                        choices=["train", "test", "resume_train", "pred", "infer"])
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", "-bs", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--lr_drop", type=int, nargs="+", default=None)
    parser.add_argument("--window_size", "-ws", type=int, default=None)
    parser.add_argument("--pretrained_weights", "-pw", default=None)
    parser.add_argument("--backbone", "-b", default=None)
    parser.add_argument("--backbone_pretrained_path", "-bpp", default=None)
    parser.add_argument("--checkpoint_path", "-ckpt", default=None)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--version", default=None)
    return parser


def config_from_args(args: argparse.Namespace) -> Config:
    overrides = {k: v for k, v in vars(args).items() if k != "config_path"}
    return load_config(args.config_path, overrides=overrides)
