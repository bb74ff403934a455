"""Batch iterators.

The reference streams trajdata `UnifiedDataset` batches from 20 CPU workers
(`/root/reference/configs/datamodules.py:8-106`). Here batches are either
(a) synthetic scenes generated on the host (tests/benchmarks/smoke training)
or (b) packed shards written by the offline converter (cld_tpu.data.packed)
and memory-mapped straight into device arrays.
"""

from __future__ import annotations

import itertools
from typing import Iterator, Optional

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.data.synthetic import synthetic_batch


class SyntheticLoader:
    """Cycles a small pool of procedurally generated batches."""

    def __init__(
        self,
        batch_size: int = 32,
        raster_size: int = 224,
        pool_size: int = 8,
        seed: int = 0,
        **kwargs,
    ):
        self.batch_size = batch_size
        self.raster_size = raster_size
        self.pool_size = pool_size
        self.seed = seed
        self.kwargs = kwargs
        self._pool: list[TrafficBatch] = []

    def _ensure_pool(self):
        while len(self._pool) < self.pool_size:
            self._pool.append(
                synthetic_batch(
                    seed=self.seed + len(self._pool),
                    batch_size=self.batch_size,
                    raster_size=self.raster_size,
                    **self.kwargs,
                )
            )

    def __iter__(self) -> Iterator[TrafficBatch]:
        self._ensure_pool()
        return itertools.cycle(self._pool)

    def take(self, n: int):
        it = iter(self)
        return [next(it) for _ in range(n)]


def make_loader(config, split: str = "train", mesh=None):
    """Loader factory from config (synthetic unless data_path points at
    packed shards).

    Under multi-host SPMD (`jax.process_count() > 1`) packed data is served
    by the multi-host pipeline: each host reads a disjoint slice and yields
    GLOBAL sharded arrays (requires `mesh`). Single-process keeps the plain
    host-local loaders — `shard_batch` places them on the mesh.
    """
    data_path = config.train.get("data_path")
    batch_size = (
        config.train.training.batch_size
        if split == "train"
        else config.train.validation.batch_size
    )
    if data_path in (None, "synthetic"):
        return SyntheticLoader(
            batch_size=batch_size,
            raster_size=config.env.rasterizer.raster_size,
            hist_frames=config.algo.history_num_frames,
            horizon=config.algo.future_num_frames,
            seed=0 if split == "train" else 10_000,
        )
    import jax

    if mesh is not None and jax.process_count() > 1:
        from cld_tpu.data.multihost import MultiHostPackedLoader

        return MultiHostPackedLoader(
            data_path, mesh, split=split, global_batch_size=batch_size,
            seed=0 if split == "train" else 10_000,
        )
    from cld_tpu.data.packed import PackedShardLoader

    # split-dependent seed, like the multihost branch: on a FLAT dataset
    # train and val both read the whole set, and identical seeds would make
    # the val loader replay the exact training sample sequence
    return PackedShardLoader(
        data_path, split=split, batch_size=batch_size,
        seed=0 if split == "train" else 10_000,
    )
