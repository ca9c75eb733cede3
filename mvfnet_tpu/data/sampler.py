"""Index sampling for sharded epochs.

Reimplements the reference DistributedSampler semantics
(``/root/reference/codes/datasets/loader/sampler.py:54-78``): epoch-seeded
shuffle, pad to a size divisible by world_size, then a rank-strided slice —
so every host sees a disjoint, equally-sized shard and the union covers the
padded dataset.

Here 'rank'/'world_size' generalize to any sharding of the input pipeline:
per-host feeding under a global mesh, or per-device in a local run.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional

import numpy as np


class ShardedSampler:
    def __init__(self, dataset_len: int, world_size: int = 1, rank: int = 0,
                 shuffle: bool = True, seed: int = 0,
                 pad: bool = True):
        assert 0 <= rank < world_size
        self.dataset_len = dataset_len
        self.world_size = world_size
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.pad = pad
        self.epoch = 0
        if pad:
            self.num_samples = int(
                math.ceil(dataset_len / world_size))
            self.total_size = self.num_samples * world_size
        else:
            self.num_samples = len(self._local_indices_nopad())
            self.total_size = dataset_len

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _global_order(self) -> np.ndarray:
        if self.shuffle:
            g = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch]))
            order = g.permutation(self.dataset_len)
        else:
            order = np.arange(self.dataset_len)
        return order

    def _local_indices_nopad(self) -> np.ndarray:
        return np.arange(self.dataset_len)[self.rank::self.world_size]

    def local_indices(self) -> List[int]:
        order = self._global_order()
        if self.pad:
            # wrap-pad to total_size (reference sampler.py:69-72)
            pad_n = self.total_size - len(order)
            if pad_n > 0:
                order = np.concatenate([order, order[:pad_n]])
            # rank-strided slice (reference sampler.py:74-76)
            return list(order[self.rank::self.world_size])
        return list(order[self.rank::self.world_size])

    def __iter__(self) -> Iterator[int]:
        return iter(self.local_indices())

    def __len__(self) -> int:
        return self.num_samples
