"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP layer (SURVEY.md §2.4).

The reference's parallelism surface is (a) data-parallel training with DDP
all-reduce and (b) per-process video sharding at inference. Both map onto one
mechanism here: a `jax.sharding.Mesh` with a `data` axis (and an optional
`model` axis for tensor sharding of the wide FFNs/attention heads at larger
scales). Gradient all-reduce is implicit: with batches sharded over `data` and
parameters replicated, XLA inserts the psum during backward (riding ICI).

Sequence/time parallelism: the per-frame stages fold time into the batch
axis, so sharding the `(b t)` rows over `data` IS the time-axis sharding the
survey calls for (§2.3) — a whole-video clip shards its frames across chips.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Create a mesh over all local devices. Default: all devices on `data`,
    1 on `model`."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard one logical axis over 'data', replicate the rest."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def time_sharding(mesh: Mesh) -> NamedSharding:
    """(T, B, ...) arrays sharded over the time axis — used for whole-video
    inference where T >> B (the SP analog from SURVEY.md §2.3)."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: dict, batch_axis_by_key=None) -> dict:
    """Device-put a host batch with the right per-leaf shardings.

    Convention: arrays shaped (T, B, ...) shard axis 1; (B, ...) shard axis 0.
    The heuristic can be overridden per key via batch_axis_by_key.

    Multi-host (process_count > 1): each host holds only its LOCAL slice of
    the global batch (see cli.main.make_batch_iterator sharding), and the
    global jax.Array is assembled from the per-process shards —
    `make_array_from_process_local_data` is the jax.distributed analog of the
    reference's per-rank DataLoader + DDP pairing (SURVEY.md §2.4).
    """
    batch_axis_by_key = batch_axis_by_key or {}
    multihost = jax.process_count() > 1

    def put(key, x):
        ax = batch_axis_by_key.get(key)
        if ax is None:
            # heuristic: leading time axis present for >=3D video-shaped arrays
            ax = 1 if (x.ndim >= 3 and key in _TIME_LEADING_KEYS) else 0
        sharding = batch_sharding(mesh, ax)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    # host-side metadata (lists/tuples) stays on host and out of jit
    return {k: put(k, v) for k, v in batch.items() if hasattr(v, "ndim")}


_TIME_LEADING_KEYS = {
    "pixels", "pad_mask", "masks", "boxes", "is_ref_inst_visible",
}
