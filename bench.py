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
torch GPU path: ~25k NFE/s for the UNGUIDED batch-128 loop (TemporalMapUnet
forward ~= 5 ms on an A100-class GPU, sequential 100-step Python loop,
ignoring per-step host syncs). The guided reference path (Adam perturbation
+ decoder backward per step, guidance_loss.py:2221-2282) is several times
slower than that, so dividing our GUIDED throughput by the UNGUIDED estimate
under-states the true ratio — i.e. this is a charitable baseline.

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

    # test-time guidance wired into the 100-step sampling scan: one Adam
    # grad step per denoise step, cost evaluated through the frozen VAE
    # decoder + unicycle (the reference's per-step perturbation,
    # guidance_loss.py:2221-2282) — this is the "guided" in the metric name.
    # Data flows as jit ARGUMENTS, never closed over: closures would bake the
    # raster batch into the HLO as a literal (a hard failure on remote-
    # compile transports).
    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.algos.reward import compute_reward
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.guidance.losses import GuidanceContext, SpeedLimitLoss
    from cld_tpu.guidance.perturbation import GuidanceSpec, make_perturbation_guidance
    from cld_tpu.models.vae import convert_action_to_state_and_action
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.ops.geometry import world_from_agent_matrix
    from cld_tpu.ops.normalization import TrajNormalizer

    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    normalizer = TrajNormalizer()

    def guided_collect(dm_state_params, batch, rng):
        enc_rng, samp_rng = jax.random.split(rng)
        _, aux = dm_trainer.encode(batch, enc_rng)
        curr = get_current_states(batch)

        def decode_fn(z):
            acts = dm_trainer.vae.apply(
                dm_trainer.vae_variables, z, aux["cond_feat"], method="decode"
            )
            traj = convert_action_to_state_and_action(
                acts, curr, dyn, normalizer, descaled_output=True
            )
            return traj[:, None]

        ctx = GuidanceContext(
            drivable_map=batch.drivable_map,
            raster_from_agent=batch.raster_from_agent,
            extent=batch.extent,
            curr_speed=batch.curr_speed,
            world_from_agent=world_from_agent_matrix(
                jnp.zeros((BATCH, 2)), jnp.zeros((BATCH,))
            ),
            scene_index=jnp.arange(BATCH),
        )
        gfn = make_perturbation_guidance(
            ctx, [GuidanceSpec(SpeedLimitLoss(speed_limit=15.0))], decode_fn,
            lr=0.3, grad_steps=1, perturb_th=1.0,
        )
        out = sample_traj(
            dm_trainer.denoise_fn(dm_state_params), dm_trainer.schedule, samp_rng,
            aux["cond_feat"], cfg.algo.horizon, cfg.algo.vae.latent_size,
            num_samp=NUM_SAMP, guidance_fn=gfn,
        )
        traj = decode_fn(out["pred_traj"])
        return compute_reward(traj, batch, normalizer.scale(traj)).mean()

    one_iter_jit = jax.jit(lambda p, b, r: guided_collect(p, b, r))

    # warmup/compile
    t0 = time.perf_counter()
    r = one_iter_jit(dm_state.params, batch, jax.random.key(10))
    jax.block_until_ready(r)
    log(f"pipeline compiled+warm in {time.perf_counter() - t0:.1f}s")

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        r = one_iter_jit(dm_state.params, batch, jax.random.key(20 + i))
    jax.block_until_ready(r)
    elapsed = time.perf_counter() - t0

    nfe = BATCH * NUM_SAMP * N_STEPS * iters
    nfe_per_sec = nfe / elapsed
    print(
        json.dumps(
            {
                "metric": "guided_sampling_nfe_per_sec",
                "value": round(nfe_per_sec, 1),
                "unit": (
                    f"NFE/s (raster encode + 100-step scan with per-step "
                    f"decoder-gradient guidance + decode + reward, batch {BATCH})"
                ),
                "vs_baseline": round(nfe_per_sec / REFERENCE_NFE_PER_SEC_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
