"""Multi-host input pipeline: per-host shard reading + global batch assembly.

The reference feeds each DDP rank through a torch DataLoader with a
DistributedSampler (`/root/reference/configs/datamodules.py:8-106` under
Lightning's DDP strategy). The TPU-native equivalent: every host process
gathers only its `global_batch / num_hosts` slice from the packed shards
(`cld_tpu.data.packed`), and the global batch is assembled as one jax.Array
per field via `jax.make_array_from_process_local_data` — data lands directly
on each host's local devices, sharded over the mesh's data axis, and no host
ever materializes (or transfers) the full global batch.

Determinism contract (mirrors DistributedSampler semantics):
  * one global permutation per epoch, seeded by (seed, epoch) — identical on
    every host, no cross-host communication needed;
  * the permutation is truncated to `steps * global_batch` and carved as
    [steps, num_hosts, local_bs]; host h takes lane h — disjoint across
    hosts, jointly covering the truncated permutation.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.data.packed import PackedShardDataset


class HostShardSampler:
    """Deterministic, disjoint, epoch-reshuffled per-host index stream."""

    def __init__(
        self,
        num_samples: int,
        global_batch: int,
        host_id: int,
        num_hosts: int,
        seed: int = 0,
    ):
        if global_batch % num_hosts:
            raise ValueError(
                f"global_batch {global_batch} must divide by num_hosts {num_hosts}"
            )
        if not 0 <= host_id < num_hosts:
            raise ValueError(f"host_id {host_id} out of range [0, {num_hosts})")
        self.num_samples = num_samples
        self.global_batch = global_batch
        self.local_batch = global_batch // num_hosts
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.seed = seed
        self.steps_per_epoch = num_samples // global_batch
        if self.steps_per_epoch == 0:
            raise ValueError(
                f"dataset of {num_samples} samples smaller than one global "
                f"batch of {global_batch}"
            )

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """[steps_per_epoch, local_batch] int64 — this host's sample indices.

        The same (seed, epoch) yields the same global permutation on every
        host; lanes are disjoint and jointly cover the truncated epoch.
        """
        rng = np.random.default_rng((self.seed, epoch))
        perm = rng.permutation(self.num_samples)
        perm = perm[: self.steps_per_epoch * self.global_batch]
        lanes = perm.reshape(self.steps_per_epoch, self.num_hosts, self.local_batch)
        return np.ascontiguousarray(lanes[:, self.host_id], dtype=np.int64)


class MultiHostPackedLoader:
    """Batch iterator yielding TrafficBatch pytrees of GLOBAL jax.Arrays.

    Each yielded leaf has global shape [global_batch, ...], sharded over the
    mesh's data axis, but only this host's `local_batch` slice was ever read
    from disk or placed in host memory. Under a single process this
    degenerates exactly to PackedShardLoader + shard_batch (verified in
    tests/test_multihost_data.py).
    """

    def __init__(
        self,
        path: str,
        mesh: Mesh,
        split: str = "train",
        global_batch_size: int = 128,
        seed: int = 0,
        num_threads: int = 8,
        axis_name: str = "dp",
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        # flat datasets (meta.json at the root, no split subdirs) are
        # legitimate and load whole; but when split subdirs exist, a name
        # that matches none of them must error — silently reading the root
        # would evaluate on training data
        split_path = os.path.join(path, split)
        if os.path.isdir(split_path):
            ds_path = split_path
        elif os.path.isfile(os.path.join(path, "meta.json")):
            ds_path = path
        else:
            subdirs = sorted(
                d for d in os.listdir(path)
                if os.path.isdir(os.path.join(path, d))
            ) if os.path.isdir(path) else []
            raise FileNotFoundError(
                f"no split {split!r} under {path!r} and no flat dataset "
                f"(meta.json) at the root; available subdirs: {subdirs}"
            )
        self.ds = PackedShardDataset(ds_path, num_threads=num_threads)
        self.mesh = mesh
        self.axis_name = axis_name
        self.sharding = NamedSharding(mesh, P(axis_name))
        host_id = jax.process_index() if process_index is None else process_index
        num_hosts = jax.process_count() if process_count is None else process_count
        self.sampler = HostShardSampler(
            self.ds.num_samples, global_batch_size, host_id, num_hosts, seed=seed
        )
        self.global_batch_size = global_batch_size

    def _assemble(self, local: dict) -> TrafficBatch:
        fields = set(TrafficBatch._fields)
        kwargs = {
            k: jax.make_array_from_process_local_data(self.sharding, v)
            for k, v in local.items()
            if k in fields
        }
        return TrafficBatch(**kwargs)

    def __iter__(self) -> Iterator[TrafficBatch]:
        epoch = 0
        while True:
            for step_idx in self.sampler.epoch_indices(epoch):
                yield self._assemble(self.ds.gather(step_idx))
            epoch += 1
