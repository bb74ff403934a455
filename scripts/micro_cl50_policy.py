#!/usr/bin/env python
"""Isolate the guided-pipeline cost at the 50-agents-per-scene closed-loop
scale (B=100, scenes of 50): none / agent-only / map-only / both, mirroring
scripts/guided_breakdown.py but at the BASELINE-spec scene blocking.

Run on an idle box only.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 100
AGENTS_PER_SCENE = 50
N_STEPS = 100


def main():
    from bench import DECODE_IMPL
    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.algos.reward import compute_reward
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import (
        AgentCollisionLoss,
        GuidanceContext,
        MapCollisionLoss,
        prepack_drivable,
    )
    from cld_tpu.guidance.perturbation import GuidanceSpec, make_perturbation_guidance
    from cld_tpu.models.vae import convert_action_to_state_and_action, decode_actions
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.ops.geometry import world_from_agent_matrix
    from cld_tpu.ops.normalization import TrajNormalizer
    from cld_tpu.utils.config import default_config
    from bench import build_flagship

    compute_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    cfg = default_config()
    cfg.train.training.batch_size = BATCH
    batch = synthetic_batch(seed=0, batch_size=BATCH, raster_size=224)
    if compute_dtype == jnp.bfloat16:
        batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
    batch = jax.tree.map(jax.device_put, batch)
    jax.block_until_ready(batch.image)
    dm_trainer, dm_state = build_flagship(cfg, compute_dtype, batch)

    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    normalizer = TrajNormalizer()
    lane = (np.arange(BATCH) % AGENTS_PER_SCENE).astype(np.float32)
    pos_w = jnp.asarray(
        np.stack([lane * 8.0, (lane % 2) * 3.5 - 1.75], axis=-1), jnp.float32
    )
    yaw_w = jnp.zeros((BATCH,))
    scene_index = jnp.arange(BATCH) // AGENTS_PER_SCENE

    def spec_sets():
        agent = GuidanceSpec(
            AgentCollisionLoss(num_disks=5, buffer_dist=0.2,
                               scene_block=AGENTS_PER_SCENE), 10.0)
        mapc = GuidanceSpec(MapCollisionLoss(), 10.0)
        return {"none": None, "agent": [agent], "map": [mapc],
                "both": [agent, mapc]}

    results = {}
    for name, specs in spec_sets().items():
        def collect(params, batch, rng, specs=specs):
            enc_rng, samp_rng = jax.random.split(rng)
            _, aux = dm_trainer.encode(batch, enc_rng)
            curr = get_current_states(batch)

            def decode_fn(z):
                acts = decode_actions(
                    dm_trainer.vae, dm_trainer.vae_variables, z,
                    aux["cond_feat"], impl=DECODE_IMPL)
                traj = convert_action_to_state_and_action(
                    acts, curr, dyn, normalizer, descaled_output=True)
                return traj[:, None]

            gfn = None
            if specs is not None:
                ctx = prepack_drivable(GuidanceContext(
                    drivable_map=batch.drivable_map,
                    raster_from_agent=batch.raster_from_agent,
                    extent=batch.extent,
                    curr_speed=batch.curr_speed,
                    world_from_agent=world_from_agent_matrix(pos_w, yaw_w),
                    scene_index=scene_index,
                ))
                gfn = make_perturbation_guidance(
                    ctx, specs, decode_fn, lr=0.3, grad_steps=1, perturb_th=1.0)
            out = sample_traj(
                dm_trainer.denoise_fn(dm_state.params), dm_trainer.schedule,
                samp_rng, aux["cond_feat"], cfg.algo.horizon,
                cfg.algo.vae.latent_size, num_samp=1, guidance_fn=gfn)
            traj = decode_fn(out["pred_traj"])
            return compute_reward(traj, batch, normalizer.scale(traj)).mean()

        t0 = time.perf_counter()
        compiled = jax.jit(collect).lower(
            dm_state.params, batch, jax.random.key(10)).compile()
        r = compiled(dm_state.params, batch, jax.random.key(10))
        jax.block_until_ready(r)
        print(f"[{name}] compiled+warm {time.perf_counter() - t0:.1f}s", flush=True)
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            r = compiled(dm_state.params, batch, jax.random.key(20 + i))
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[name] = ms
        print(f"[{name}] {ms:.1f} ms/call  "
              f"(+{(ms - results.get('none', ms)) / N_STEPS:.3f} ms/step over none)",
              flush=True)

    print(f"\nB={BATCH} scenes of {AGENTS_PER_SCENE}:")
    for k, v in results.items():
        print(f"  {k:6s} {v:8.1f} ms/call  {BATCH * N_STEPS / v * 1e3:8.0f} NFE/s")


if __name__ == "__main__":
    main()
