#!/usr/bin/env python
"""Sampler scan-unroll sweep on the flagship guided pipeline.

The 100-step denoise scan pays per-iteration loop overhead; unroll > 1
fuses consecutive steps (at proportional compile cost on the axon tunnel).
Times bench.py's guided_collect at unroll in {1, 2, 4} and the unguided
collect at the best guided unroll.

Run on an idle box only.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH, AGENTS_PER_SCENE, N_STEPS = 128, 4, 100


def main():
    import bench
    from bench import build_flagship, flagship_guidance_specs
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.utils.config import default_config

    compute_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    cfg = default_config()
    cfg.train.training.batch_size = BATCH
    batch = synthetic_batch(seed=0, batch_size=BATCH, raster_size=224)
    if compute_dtype == jnp.bfloat16:
        batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
    batch = jax.tree.map(jax.device_put, batch)
    jax.block_until_ready(batch.image)
    dm_trainer, dm_state = build_flagship(cfg, compute_dtype, batch)

    for guided in (True, False):
        for unroll in (1, 2, 4):
            bench.UNROLL = unroll
            t0 = time.perf_counter()
            rate = bench.bench_open_loop(cfg, dm_trainer, dm_state, batch, guided=guided)
            print(
                f"guided={guided} unroll={unroll}: {rate:,.0f} NFE/s "
                f"(incl. warm {time.perf_counter() - t0:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
