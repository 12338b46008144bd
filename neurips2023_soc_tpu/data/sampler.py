"""Dataset sharding samplers (reference datasets/sampler.py — the Deformable-
DETR DistributedSampler/NodeDistributedSampler pair, rebuilt for
single-controller JAX multi-host runs).

With pjit + global batches a sampler only needs to (a) shuffle with an
epoch-seeded RNG identically on every host and (b) hand each host its slice
of every global batch.
"""
from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np


class ShardedEpochSampler:
    """Epoch-reshuffled index sampler with per-host sharding.

    Every host computes the same permutation (same seed), then takes
    `host_id::num_hosts` — the jax analog of torch's DistributedSampler with
    drop_last=False padding semantics.
    """

    def __init__(self, dataset_size: int, num_hosts: int = 1, host_id: int = 0,
                 shuffle: bool = True, seed: int = 0):
        self.dataset_size = dataset_size
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        return (self.dataset_size + self.num_hosts - 1) // self.num_hosts

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.dataset_size)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        # pad to a multiple of num_hosts by wrapping (torch semantics)
        total = len(self) * self.num_hosts
        if total > len(order):
            order = np.concatenate([order, order[: total - len(order)]])
        return iter(order[self.host_id :: self.num_hosts].tolist())
