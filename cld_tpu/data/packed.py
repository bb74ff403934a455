"""Packed-shard dataset: the offline-converted, mmap-backed replacement for
trajdata's runtime cache.

The reference's data path keeps trajdata + 20 dataloader workers in the
training loop (`/root/reference/configs/datamodules.py:8-106`). Here,
dataset preparation is offline (see `cld_tpu/data/convert.py`): every
TrafficBatch field becomes one contiguous binary file + a JSON schema.
Reading is a batched index-gather served by the native C++ reader
(`cld_tpu/native/shard_reader.cpp`, mmap + thread-pool memcpy, no GIL),
with a numpy-memmap fallback when the native library can't be built.

Format (directory):
    meta.json   {"num_samples": N, "fields": {name: {"shape": [...], "dtype": "..."}}}
    <field>.bin raw C-order array [N, *shape]
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, Iterator, Optional

import numpy as np
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libshard_reader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "shard_reader.cpp")


def _build_native() -> Optional[ctypes.CDLL]:
    """Compile + load the native reader; None if unavailable."""
    try:
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH, "-lpthread"],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.shard_open.restype = ctypes.c_void_p
        lib.shard_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.shard_num_samples.restype = ctypes.c_int64
        lib.shard_num_samples.argtypes = [ctypes.c_void_p]
        lib.shard_gather.restype = ctypes.c_int
        lib.shard_gather.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.shard_close.argtypes = [ctypes.c_void_p]
        return lib
    except Exception:
        return None


_NATIVE_LIB: Optional[ctypes.CDLL] = None
_NATIVE_TRIED = False


def native_lib() -> Optional[ctypes.CDLL]:
    global _NATIVE_LIB, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_LIB = _build_native()
        _NATIVE_TRIED = True
    return _NATIVE_LIB


def write_packed(path: str, fields: Dict[str, np.ndarray]):
    """Write a field dict (each [N, ...]) as a packed-shard directory."""
    os.makedirs(path, exist_ok=True)
    num = None
    meta = {"version": 1, "fields": {}}
    for name, arr in fields.items():
        arr = np.ascontiguousarray(arr)
        if num is None:
            num = arr.shape[0]
        assert arr.shape[0] == num, f"{name}: inconsistent sample count"
        arr.tofile(os.path.join(path, f"{name}.bin"))
        meta["fields"][name] = {
            "shape": list(arr.shape[1:]),
            "dtype": str(arr.dtype),
        }
    meta["num_samples"] = int(num)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


class PackedShardDataset:
    """Random-access gather over a packed-shard directory."""

    def __init__(self, path: str, num_threads: int = 8, use_native: bool = True):
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.path = path
        self.num_samples = self.meta["num_samples"]
        self.num_threads = num_threads
        self._lib = native_lib() if use_native else None
        self._handles: Dict[str, int] = {}
        self._mmaps: Dict[str, np.memmap] = {}
        for name, info in self.meta["fields"].items():
            fpath = os.path.join(path, f"{name}.bin")
            dtype = np.dtype(info["dtype"])
            sample_bytes = int(np.prod(info["shape"]) * dtype.itemsize) if info["shape"] else dtype.itemsize
            if self._lib is not None:
                h = self._lib.shard_open(fpath.encode(), sample_bytes)
                if h:
                    self._handles[name] = h
                    continue
            self._mmaps[name] = np.memmap(
                fpath, dtype=dtype, mode="r",
                shape=(self.num_samples, *info["shape"]),
            )

    @property
    def uses_native(self) -> bool:
        return bool(self._handles)

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        out = {}
        for name, info in self.meta["fields"].items():
            dtype = np.dtype(info["dtype"])
            shape = (len(indices), *info["shape"])
            if name in self._handles:
                buf = np.empty(shape, dtype=dtype)
                rc = self._lib.shard_gather(
                    self._handles[name],
                    indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    len(indices),
                    buf.ctypes.data_as(ctypes.c_char_p),
                    self.num_threads,
                )
                if rc != 0:
                    raise IndexError(f"shard_gather failed for field {name}")
                out[name] = buf
            else:
                out[name] = np.asarray(self._mmaps[name][indices])
        return out

    def close(self):
        if self._lib is not None:
            for h in self._handles.values():
                self._lib.shard_close(h)
            self._handles.clear()


def write_batches(path: str, batches) -> None:
    """Pack a list of TrafficBatch into shards (fields stacked over samples)."""
    fields: Dict[str, list] = {}
    for b in batches:
        for name, val in b._asdict().items():
            if val is None:
                continue
            fields.setdefault(name, []).append(np.asarray(val))
    write_packed(path, {k: np.concatenate(v, axis=0) for k, v in fields.items()})


class PackedShardLoader:
    """Shuffled batch iterator producing TrafficBatch pytrees."""

    def __init__(self, path: str, split: str = "train", batch_size: int = 128,
                 seed: int = 0, num_threads: int = 8):
        # same split resolution as MultiHostPackedLoader: flat datasets
        # (meta.json at the root) load whole, but an unknown split name on
        # a split dataset must error — silently reading the root would
        # evaluate on training data
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
        self.batch_size = batch_size
        self.seed = seed

    def __iter__(self) -> Iterator[TrafficBatch]:
        rng = np.random.default_rng(self.seed)
        n = self.ds.num_samples
        batch_fields = set(TrafficBatch._fields)
        while True:
            idx = rng.integers(0, n, self.batch_size)
            raw = self.ds.gather(idx)
            kwargs = {k: jnp.asarray(v) for k, v in raw.items() if k in batch_fields}
            yield TrafficBatch(**kwargs)
