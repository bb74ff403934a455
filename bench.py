#!/usr/bin/env python
"""Benchmark: latent-diffusion sampling throughput on real hardware.

Headline metric (BASELINE.json): guided-diffusion NFE/sec on nuScenes-sized
batches. One NFE = one denoiser evaluation for one trajectory. The measured
pipeline per iteration is the full action-sampling path of the reference's
PPO collection step (`guide_dm_trainer.py:84-118`): context encoding
(ResNet-18 over the 224x224x34 raster stack) + 100-step reverse diffusion
(lax.scan) + VAE decode + unicycle integration + reward computation.

The reference publishes no absolute throughput (BASELINE.md); `vs_baseline`
is reported against a documented engineering estimate of the reference's
torch GPU path on the same workload: ~25k NFE/s (batch-128 TemporalMapUnet
forward ~= 5 ms on an A100-class GPU, sequential 100-step Python loop,
ignoring its per-step host sync overheads — i.e. a charitable estimate).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_NFE_PER_SEC_ESTIMATE = 25_000.0

# batch 128 matches the reference's training batch of record; NFE/s is
# throughput-normalized so the metric is comparable across batch sizes.
BATCH = int(os.environ.get("BENCH_BATCH", 128))
NUM_SAMP = 1
N_STEPS = 100


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.models.temporal_unet import TemporalMapUnet
    from cld_tpu.models.vae import VaeModel
    from cld_tpu.training.dm import DMTrainer
    from cld_tpu.training.ppo import PPOTrainer, buffer_init
    from cld_tpu.utils.config import default_config

    compute_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    cfg = default_config()
    cfg.train.training.batch_size = BATCH
    t0 = time.perf_counter()
    batch = synthetic_batch(seed=0, batch_size=BATCH, raster_size=224)
    if compute_dtype == jnp.bfloat16:
        batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
    batch = jax.tree.map(jax.device_put, batch)
    jax.block_until_ready(batch.image)
    log(f"synthetic batch B={BATCH} built+transferred in {time.perf_counter() - t0:.1f}s")

    # full-size models (config of record), bf16 compute on TPU
    t0 = time.perf_counter()
    vae = VaeModel(dtype=compute_dtype)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    vae_vars = jax.jit(lambda r, b: vae.init(r, b, 0.05))(rngs, batch)
    log(f"vae init in {time.perf_counter() - t0:.1f}s")
    dm_trainer = DMTrainer(cfg, vae_vars)
    dm_trainer.vae = VaeModel(dtype=compute_dtype)
    dm_trainer.unet = TemporalMapUnet(
        transition_dim=cfg.algo.vae.latent_size,
        output_dim=cfg.algo.vae.latent_size,
        dim=cfg.algo.base_dim,
        dim_mults=tuple(cfg.algo.dim_mults),
        dtype=compute_dtype,
    )
    dm_state = dm_trainer.init_state(jax.random.key(2))
    ppo = PPOTrainer(cfg, dm_trainer)
    buf = buffer_init(
        cfg.algo.buffer_max, cfg.algo.horizon, cfg.algo.vae.latent_size,
        cfg.algo.cond_feat_dim,
    )

    # data flows as jit ARGUMENTS, never closed over: closures would bake the
    # raster batch into the HLO as a literal (megabytes of constants, and a
    # hard failure on remote-compile transports)
    one_iter_jit = ppo.collect_step  # already jitted with explicit args

    # warmup/compile
    t0 = time.perf_counter()
    out_buf, metrics = one_iter_jit(dm_state, buf, batch, jax.random.key(10))
    jax.block_until_ready(metrics["reward"])
    log(f"pipeline compiled+warm in {time.perf_counter() - t0:.1f}s")

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        out_buf, metrics = one_iter_jit(dm_state, out_buf, batch, jax.random.key(20 + i))
    jax.block_until_ready(metrics["reward"])
    elapsed = time.perf_counter() - t0

    nfe = BATCH * NUM_SAMP * N_STEPS * iters
    nfe_per_sec = nfe / elapsed
    print(
        json.dumps(
            {
                "metric": "guided_sampling_nfe_per_sec",
                "value": round(nfe_per_sec, 1),
                "unit": f"NFE/s (full pipeline: raster encode + 100-step scan + decode + reward, batch {BATCH})",
                "vs_baseline": round(nfe_per_sec / REFERENCE_NFE_PER_SEC_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
