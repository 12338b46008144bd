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


# Reference-YAML compatibility: keys the reference configs use whose role is
# carried by a differently-named (or differently-typed) key here. Applied
# only when the target key is absent, so our own configs are unaffected and a
# user can point the CLIs directly at the reference's configs/*.yaml.
#   enable_amp (trainer.py:107 autocast)      -> compute_dtype
#   davis_path (infer_davis.py:79 data root)  -> img_folder
#   out_dir    (main.py:43 visualize output)  -> output_dir
_REFERENCE_ALIASES = (
    ("enable_amp", "compute_dtype",
     lambda v: "bfloat16" if v else "float32"),
    ("davis_path", "img_folder", None),
    ("out_dir", "output_dir", None),
)


def _apply_reference_aliases(data: Dict[str, Any]) -> Dict[str, Any]:
    for ref_key, our_key, conv in _REFERENCE_ALIASES:
        if ref_key in data and our_key not in data:
            v = data[ref_key]
            data[our_key] = conv(v) if conv else v
    return data


def load_config(
    path: str | Path,
    overrides: Optional[Mapping[str, Any]] = None,
) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f)
    data = _apply_reference_aliases(_flatten_yaml(raw or {}))
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
    parser.add_argument(
        "--grad_accum_steps", type=int, default=None,
        help="micro-batches averaged per optimizer update (effective global "
             "batch = batch_size * grad_accum_steps); how fewer chips "
             "reproduce the reference's 8-GPU global batch")
    return parser


def config_from_args(args: argparse.Namespace) -> Config:
    overrides = {k: v for k, v in vars(args).items() if k != "config_path"}
    return load_config(args.config_path, overrides=overrides)
