"""Multi-host coordination helpers — the TPU equivalents of the reference's
pickle-based collectives (misc.py:24-64 all_gather, trainer.py:250 barriers).
Single-host runs short-circuit to no-ops.
"""
from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def initialize_distributed(config=None) -> bool:
    """Multi-host runtime init — the jax.distributed analog of the
    reference's init_process_group (trainer.py:440-461), except the reference
    hardcodes single-node NCCL (main.py:12-13) while this scales to pods.

    Called unconditionally at CLI entry. Initializes when a coordinator is
    configured (env JAX_COORDINATOR_ADDRESS / config keys
    coordinator_address + num_processes + process_id) or when running under a
    TPU pod environment where jax.distributed auto-detects. Single-process
    runs are a no-op. Returns True if distributed was initialized."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or (
        config.get("coordinator_address") if config is not None else None)
    # single-slice multi-host pods export TPU_WORKER_HOSTNAMES as a
    # comma-separated host list; libtpu images export a warning STRING when
    # undeterminable — only trust values that look like hostnames. And a
    # 1-host list means single-process: initializing buys nothing.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    hosts_valid = ("," in hosts and " " not in hosts
                   and not hosts.startswith("WARNING"))
    auto_env = bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")) or hosts_valid
    if not addr and not auto_env:
        return False
    kwargs = {}
    if addr:
        kwargs["coordinator_address"] = addr
        num = os.environ.get("JAX_NUM_PROCESSES") or (
            config.get("num_processes") if config is not None else None)
        pid = os.environ.get("JAX_PROCESS_ID") or (
            config.get("process_id") if config is not None else None)
        if num is not None:
            kwargs["num_processes"] = int(num)
        if pid is not None:
            kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    print(f"jax.distributed initialized: process {jax.process_index()}/"
          f"{jax.process_count()}, {len(jax.local_devices())} local / "
          f"{len(jax.devices())} global devices")
    return True


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
