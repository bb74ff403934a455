"""Packed-shard dataset tests: roundtrip, native reader, loader."""

import numpy as np
import pytest

from cld_tpu.data.packed import (
    PackedShardDataset,
    PackedShardLoader,
    native_lib,
    write_batches,
    write_packed,
)
from cld_tpu.data.synthetic import synthetic_batch


@pytest.fixture()
def shard_dir(tmp_path):
    rng = np.random.default_rng(0)
    fields = {
        "a": rng.normal(size=(20, 4, 3)).astype(np.float32),
        "b": rng.integers(0, 100, (20, 7)).astype(np.int32),
        "c": rng.normal(size=(20,)).astype(np.float64),
    }
    path = str(tmp_path / "shards")
    write_packed(path, fields)
    return path, fields


def test_roundtrip_identity(shard_dir):
    path, fields = shard_dir
    ds = PackedShardDataset(path)
    idx = np.arange(20)
    out = ds.gather(idx)
    for k in fields:
        np.testing.assert_array_equal(out[k], fields[k])
    ds.close()


def test_native_reader_builds_and_matches(shard_dir):
    path, fields = shard_dir
    assert native_lib() is not None, "native shard reader failed to build"
    ds_native = PackedShardDataset(path, use_native=True)
    assert ds_native.uses_native
    ds_py = PackedShardDataset(path, use_native=False)
    assert not ds_py.uses_native
    idx = np.array([3, 3, 19, 0, 7], np.int64)
    out_n = ds_native.gather(idx)
    out_p = ds_py.gather(idx)
    for k in fields:
        np.testing.assert_array_equal(out_n[k], out_p[k])
    ds_native.close()


def test_native_reader_rejects_bad_index(shard_dir):
    path, _ = shard_dir
    ds = PackedShardDataset(path, use_native=True)
    if not ds.uses_native:
        pytest.skip("native reader unavailable")
    with pytest.raises(IndexError):
        ds.gather(np.array([25]))
    ds.close()


def test_loader_yields_traffic_batches(tmp_path):
    path = str(tmp_path / "tb")
    batches = [synthetic_batch(seed=i, batch_size=2, raster_size=32) for i in range(3)]
    write_batches(path, batches)
    loader = PackedShardLoader(path, batch_size=4, seed=1)
    it = iter(loader)
    b = next(it)
    assert b.image.shape == (4, 32, 32, 34)
    assert b.curr_speed.shape == (4,)
    b2 = next(it)
    assert not np.array_equal(np.asarray(b.curr_speed), np.asarray(b2.curr_speed))


def test_make_loader_dispatch(tmp_path):
    from cld_tpu.data.loader import make_loader
    from cld_tpu.utils.config import default_config

    path = str(tmp_path / "disp")
    write_batches(path, [synthetic_batch(seed=0, batch_size=2, raster_size=32)])
    cfg = default_config()
    cfg.train.data_path = path
    cfg.train.training.batch_size = 2
    loader = make_loader(cfg, "train")
    b = next(iter(loader))
    assert b.image.shape[0] == 2
