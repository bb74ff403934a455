#!/usr/bin/env python
"""Re-run the headline open-loop guided/unguided phases (exact bench.py
bodies) on an idle box — the fast loop for judging a perf change without a
full bench run. Usage: python scripts/micro_headline.py [guided|unguided ...]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

which = sys.argv[1:] or ["unguided", "guided"]

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.utils.config import default_config

cfg = default_config()
cfg.train.training.batch_size = bench.BATCH
compute_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
batch = synthetic_batch(seed=0, batch_size=bench.BATCH, raster_size=224)
if compute_dtype == jnp.bfloat16:
    batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
batch = jax.tree.map(jax.device_put, batch)
jax.block_until_ready(batch.image)
dm_trainer, dm_state = bench.build_flagship(cfg, compute_dtype, batch)
print("flagship built", flush=True)

for w in which:
    t0 = time.perf_counter()
    nfe, mfu = bench.bench_open_loop(cfg, dm_trainer, dm_state, batch,
                                     guided=(w == "guided"))
    print(f"{w:9s} NFE/s = {nfe:9.0f}  mfu={mfu}  "
          f"({(bench.BATCH * bench.NUM_SAMP) / nfe * 1e3:.4f} ms/step, "
          f"phase wall {time.perf_counter() - t0:.0f}s)", flush=True)
