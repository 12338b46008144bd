"""Orbax checkpointing with the reference's retention policy
(trainer.py:363-422): keep at most `max_keep` epoch checkpoints plus a `best`
pointer chosen by mAP (A2D) or lowest train loss (Ref-YTVOS). Also loads
torch `.pth.tar` checkpoints through training.convert for the model zoo.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, max_keep: int = 5,
                 create: bool = True):
        """`create=False` for read-only use (resume/load from an explicit
        path): a mistyped path then fails with FileNotFoundError instead of
        leaving a spurious empty directory tree behind."""
        self.dir = Path(directory)
        if create:
            self.dir.mkdir(parents=True, exist_ok=True)
        elif not self.dir.is_dir():
            raise FileNotFoundError(f"checkpoint directory not found: {self.dir}")
        self.max_keep = max_keep
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, epoch: int) -> Path:
        return self.dir / f"epoch_{epoch:04d}"

    def save(self, epoch: int, state: Dict[str, Any], is_best: bool,
             extra: Optional[Dict[str, Any]] = None):
        import jax

        path = self._path(epoch)
        # the orbax save is COLLECTIVE (all processes participate); the json
        # sidecars and pruning are host-file work for rank 0 only
        self._ckptr.save(path.absolute(), state, force=True)
        self._ckptr.wait_until_finished()
        if jax.process_index() != 0:
            return
        meta = {"epoch": epoch, **(extra or {})}
        (path / "meta.json").write_text(json.dumps(meta))
        if is_best:
            (self.dir / "best.json").write_text(json.dumps(meta))
        self._prune(best_epoch=self.best_epoch())

    def best_epoch(self) -> Optional[int]:
        bj = self.dir / "best.json"
        if bj.exists():
            return json.loads(bj.read_text()).get("epoch")
        return None

    def _prune(self, best_epoch: Optional[int]):
        ckpts = sorted(self.dir.glob("epoch_*"))
        removable = [c for c in ckpts
                     if best_epoch is None or c.name != f"epoch_{best_epoch:04d}"]
        while len(ckpts) > self.max_keep and removable:
            victim = removable.pop(0)
            ckpts.remove(victim)
            import shutil

            shutil.rmtree(victim)

    def latest_epoch(self) -> Optional[int]:
        ckpts = sorted(self.dir.glob("epoch_*"))
        if not ckpts:
            return None
        return int(ckpts[-1].name.split("_")[1])

    def restore(self, epoch: int, target: Dict[str, Any]) -> Dict[str, Any]:
        return self._ckptr.restore(self._path(epoch).absolute(), target=target)

    def read_meta(self, epoch: int) -> Optional[Dict[str, Any]]:
        mj = self._path(epoch) / "meta.json"
        if mj.exists():
            return json.loads(mj.read_text())
        return None


def load_torch_checkpoint(path: str, loaded_ckpt=None):
    """Read a torch .pth.tar into a numpy state_dict (CPU torch only).
    `loaded_ckpt` lets a caller that already torch.load'ed the file (e.g. for
    epoch/best metadata) skip a second multi-GB deserialization."""
    if loaded_ckpt is None:
        import torch

        loaded_ckpt = torch.load(path, map_location="cpu", weights_only=False)
    ckpt = loaded_ckpt
    sd = ckpt.get("model_state_dict", ckpt.get("state_dict", ckpt))
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def load_pretrained_into_params(path: str, params, drop_class_embed: bool = False,
                                loaded_ckpt=None):
    """Torch zoo checkpoint -> flax params (with optional class-head surgery,
    reference trainer.py:430-438)."""
    from .convert import convert_torch_state_dict

    sd = load_torch_checkpoint(path, loaded_ckpt=loaded_ckpt)
    if drop_class_embed:
        sd = {k: v for k, v in sd.items() if not k.startswith("class_embed")}
    return convert_torch_state_dict(sd, params)


def _flat_path_items(tree) -> Dict[tuple, Any]:
    """Flatten a nested-dict pytree to {(key, ...): leaf}. Flax params and
    orbax tree metadata are both nested string-keyed dicts."""
    import jax

    out = {}
    for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path)] = v
    return out


def _nest(flat: Dict[tuple, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, v in flat.items():
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return root


def load_params_from_path(path: str, params, drop_class_embed: bool = False,
                          loaded_ckpt=None):
    """Model weights from an EXPLICIT checkpoint path — either a torch zoo
    `.pth.tar` (reference main.py:29-35 loads config.checkpoint_path) or an
    orbax checkpoint dir saved by CheckpointManager. Returns
    (params, {'missing': [...], 'unused': [...]}).

    The orbax branch restores with a params-only target (partial restore:
    opt_state/step are never read into host RAM) and validates against the
    checkpoint's own metadata — a target leaf absent from the checkpoint or
    saved with a different shape is reported in 'missing' and keeps the
    caller's (typically freshly-initialized) value, never a silently wrong
    tensor."""
    import jax

    p = str(path)
    if p.endswith((".pth", ".pth.tar", ".pt")):
        return load_pretrained_into_params(
            p, params, drop_class_embed=drop_class_embed,
            loaded_ckpt=loaded_ckpt)
    d = Path(p)
    if not d.is_dir():
        raise FileNotFoundError(f"checkpoint path not found: {d}")
    if not d.name.startswith("epoch_") and list(d.glob("epoch_*")):
        # a CheckpointManager root: prefer the best epoch, else the latest
        # (the orbax analog of the reference zoo's best.pth.tar pointer)
        mgr = CheckpointManager(d, create=False)
        epoch = mgr.best_epoch()
        epoch = epoch if epoch is not None else mgr.latest_epoch()
        d = mgr._path(epoch)

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        meta = ckptr.metadata(d.absolute()).item_metadata
        saved = _flat_path_items(meta.tree if hasattr(meta, "tree") else meta)
        # CheckpointManager saves {'params', 'opt_state', 'step'}; accept a
        # bare params tree from other writers too
        prefixed = any(k and k[0] == "params" for k in saved)
        saved_params = ({k[1:]: v for k, v in saved.items()
                         if k and k[0] == "params"}
                        if prefixed else saved)
        target_flat = _flat_path_items(params)
        missing = sorted(
            "/".join(map(str, k)) for k, v in target_flat.items()
            if k not in saved_params
            or tuple(saved_params[k].shape) != tuple(np.shape(v)))
        unused = sorted("/".join(map(str, k))
                        for k in saved_params if k not in target_flat)
        ok = {k for k, v in target_flat.items()
              if k in saved_params
              and tuple(saved_params[k].shape) == tuple(np.shape(v))}
        merged_flat = dict(target_flat)
        if ok:
            item = _nest({k: target_flat[k] for k in ok})
            if prefixed:
                item = {"params": item}
            restored = ckptr.restore(
                d.absolute(),
                args=ocp.args.PyTreeRestore(item=item, partial_restore=True),
            )
            restored_flat = _flat_path_items(
                restored["params"] if prefixed else restored)
            for k in ok:
                merged_flat[k] = restored_flat[k]

    treedef = jax.tree_util.tree_structure(params)
    order = list(_flat_path_items(params).keys())
    new = jax.tree_util.tree_unflatten(
        treedef, [merged_flat[k] for k in order])
    return new, {"missing": missing, "unused": unused}


def save_reference_checkpoint(params, path: str, epoch: int = 0,
                              total_epochs: int = 0, best_map=None,
                              best_loss=None):
    """Write a `.pth.tar` in the reference trainer's EXACT on-disk format
    (reference trainer.py:380-422: model weights nested under
    'model_state_dict' beside epoch/total_epochs/optimizer/scheduler/
    grad_scaler entries, best_mAP for A2D-style runs or best_loss for
    YTVOS-style) so checkpoints trained here interoperate with the reference
    codebase and its inference CLIs (infer_refytb.py:143-156)."""
    import torch

    from .convert import export_torch_state_dict

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(params).items()}
    ckpt = {
        "epoch": epoch,
        "total_epochs": total_epochs,
        "model_state_dict": sd,
        "optimizer_state_dict": {},
        "scheduler_state_dict": {},
        "grad_scaler_state_dict": {},
    }
    if best_map is not None:
        ckpt["best_mAP"] = float(best_map)
    if best_loss is not None:
        ckpt["best_loss"] = float(best_loss)
    torch.save(ckpt, path)
    return path
