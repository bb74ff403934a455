#!/usr/bin/env python
"""Closed-loop replan cost attribution: policy (guided sampling) vs
render_observation (map warp + history raster) vs env stepping/metrics.

Times bench.py's bench_closed_loop configuration three ways:
  full      guided DM policy (the bench number)
  zero      policy returns zeros -> render + env only
  nowarp    zero policy AND render with the semantic warp knocked out
            (constant map) -> history raster + env only

Run on an idle box only (CLAUDE.md measurement-contamination note).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CL_SCENES = int(sys.argv[1]) if len(sys.argv) > 1 else 4
CL_AGENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CL_STEPS = 100


def main():
    from bench import build_flagship, flagship_guidance_specs
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.sim import env as sim_env
    from cld_tpu.sim.env import SimConfig, simulate
    from cld_tpu.sim.scene import synthetic_scene_pack
    from cld_tpu.utils.config import default_config

    compute_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    cfg = default_config()
    batch = synthetic_batch(seed=0, batch_size=8, raster_size=224)
    dm_trainer, dm_state = build_flagship(cfg, compute_dtype, batch)

    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    sim_cfg = SimConfig(
        num_simulation_steps=CL_STEPS,
        n_step_action=5,
        hist_frames=cfg.algo.history_num_frames,
        raster_size=cfg.env.rasterizer.raster_size,
        pixel_size=cfg.env.rasterizer.pixel_size,
        dyn=dyn,
    )
    pack = synthetic_scene_pack(
        seed=0, num_scenes=CL_SCENES, agents_per_scene=CL_AGENTS,
        sim_steps=CL_STEPS,
    )
    Na = pack.num_agents
    T_plan = cfg.algo.horizon

    # --- policies ---
    import bench as bench_mod

    def make_full_policy():
        from cld_tpu.algos.dm import sample_traj
        from cld_tpu.data.batch import get_current_states
        from cld_tpu.guidance.losses import GuidanceContext, prepack_drivable
        from cld_tpu.guidance.perturbation import make_perturbation_guidance
        from cld_tpu.models.vae import (
            convert_action_to_state_and_action,
            decode_actions,
        )
        from cld_tpu.ops.normalization import TrajNormalizer

        normalizer = TrajNormalizer()
        specs = flagship_guidance_specs(CL_AGENTS)

        def policy(obs, rng):
            enc_rng, samp_rng = jax.random.split(rng)
            _, aux = dm_trainer.encode(obs, enc_rng)
            curr = get_current_states(obs)

            def decode_fn(z):
                acts = decode_actions(
                    dm_trainer.vae, dm_trainer.vae_variables, z,
                    aux["cond_feat"], impl=bench_mod.DECODE_IMPL,
                )
                traj = convert_action_to_state_and_action(
                    acts, curr, dyn, normalizer, descaled_output=True
                )
                return traj[:, None]

            ctx = prepack_drivable(GuidanceContext(
                drivable_map=obs.drivable_map,
                raster_from_agent=obs.raster_from_agent,
                extent=obs.extent,
                curr_speed=obs.curr_speed,
                world_from_agent=obs.world_from_agent,
                scene_index=obs.scene_index,
            ))
            gfn = make_perturbation_guidance(
                ctx, specs, decode_fn, lr=0.3, grad_steps=1, perturb_th=1.0
            )
            out = sample_traj(
                dm_trainer.denoise_fn(dm_state.params), dm_trainer.schedule,
                samp_rng, aux["cond_feat"], cfg.algo.horizon,
                cfg.algo.vae.latent_size, num_samp=1, guidance_fn=gfn,
            )
            return decode_fn(out["pred_traj"])[:, 0, :, 4:6]

        return policy

    def zero_policy(obs, rng):
        # consume the image so the render isn't dead-code-eliminated
        eps = 1e-30 * jnp.mean(obs.image)
        return jnp.zeros((Na, T_plan, 2)) + eps

    def run_mode(name, policy):
        run = jax.jit(lambda rng: simulate(pack, policy, rng, sim_cfg))
        t0 = time.perf_counter()
        _, traj = run(jax.random.key(0))
        traj.block_until_ready()
        print(f"[{name}] compiled+warm {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        _, traj = run(jax.random.key(1))
        traj.block_until_ready()
        dt = time.perf_counter() - t0
        print(
            f"[{name}] {dt*1e3:.1f} ms/episode  {Na*CL_STEPS/dt:.0f} agent-steps/s",
            flush=True,
        )
        return dt

    full = run_mode("full", make_full_policy())
    zero = run_mode("zero", zero_policy)

    # knock out the semantic warp: constant map channels
    orig_warp = sim_env.warp_scene_maps

    def const_warp(world_maps, origin, res, w_from_a, scene_index, rs, ps, ec,
                   fill_value=0.0, impl="auto", world_maps_q8=None):
        B = w_from_a.shape[0]
        C = world_maps.shape[-1]
        return jnp.ones((B, rs, rs, C), world_maps.dtype)

    sim_env.warp_scene_maps = const_warp
    try:
        nowarp = run_mode("nowarp", zero_policy)
    finally:
        sim_env.warp_scene_maps = orig_warp

    print(f"\npolicy (guided sampling): {(full - zero)*1e3:8.1f} ms/episode")
    print(f"semantic map warp:        {(zero - nowarp)*1e3:8.1f} ms/episode")
    print(f"history raster + env:     {nowarp*1e3:8.1f} ms/episode")
    print(f"per replan (20): policy {(full-zero)/20*1e3:.2f} ms, "
          f"warp {(zero-nowarp)/20*1e3:.2f} ms, rest {nowarp/20*1e3:.2f} ms")


if __name__ == "__main__":
    main()
