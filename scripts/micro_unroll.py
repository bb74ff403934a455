#!/usr/bin/env python
"""A/B the sampling-scan unroll factor on the flagship guided pipeline.

Usage: python scripts/micro_unroll.py [unroll ...]   (default: 1 2 4)

Sets BENCH_UNROLL before importing bench and reuses its pipeline builders,
so the measured body is EXACTLY the headline benchmark. Compile time grows
with the unrolled body (axon tunnel: minutes); run on an idle box.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

factors = [int(a) for a in sys.argv[1:]] or [1, 2, 4]

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

results = {}
for f in factors:
    os.environ["BENCH_UNROLL"] = str(f)
    # bench reads BENCH_UNROLL at import; reload for each factor
    for mod in ("bench",):
        if mod in sys.modules:
            del sys.modules[mod]
    import bench

    compute_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.utils.config import default_config

    cfg = default_config()
    cfg.train.training.batch_size = bench.BATCH
    batch = synthetic_batch(seed=0, batch_size=bench.BATCH, raster_size=224)
    if compute_dtype == jnp.bfloat16:
        batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
    batch = jax.tree.map(jax.device_put, batch)
    jax.block_until_ready(batch.image)
    dm_trainer, dm_state = bench.build_flagship(cfg, compute_dtype, batch)

    t0 = time.perf_counter()
    guided, _ = bench.bench_open_loop(cfg, dm_trainer, dm_state, batch, guided=True)
    unguided, _ = bench.bench_open_loop(cfg, dm_trainer, dm_state, batch, guided=False)
    results[f] = (guided, unguided)
    print(f"unroll={f}: guided {guided:.0f} NFE/s, unguided {unguided:.0f} NFE/s "
          f"(total {time.perf_counter() - t0:.0f}s)")

print()
for f, (g, u) in results.items():
    print(f"unroll={f:2d}  guided {g:9.0f}  unguided {u:9.0f}")
