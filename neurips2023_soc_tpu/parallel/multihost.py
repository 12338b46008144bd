"""Multi-host coordination helpers — the TPU equivalents of the reference's
pickle-based collectives (misc.py:24-64 all_gather, trainer.py:250 barriers).
Single-host runs short-circuit to no-ops.
"""
from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    """dist.barrier equivalent (sync_global_devices)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def gather_objects(obj: Any) -> List[Any]:
    """all_gather of arbitrary picklable objects (reference misc.py:24-64):
    pickle to bytes, pad to the global max length, all-gather as uint8."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    local_len = np.array([data.size], np.int64)
    all_lens = multihost_utils.process_allgather(local_len).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: data.size] = data
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(jax.process_count()):
        n = int(all_lens[i])
        out.append(pickle.loads(gathered[i, :n].tobytes()))
    return out


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Rank-0 writes, others read (reference's output-dir sync,
    trainer.py:118-122)."""
    if jax.process_count() == 1:
        return obj
    return gather_objects(obj)[root]
