#!/usr/bin/env python
"""Closed-loop guided simulation CLI.

Capability parity with `/root/reference/rollout.py:21-118` +
`guided_rollout` (`scene_edit_utils.py:15-160`): load VAE/DM checkpoints,
build scenes, run receding-horizon rollout with optional test-time guidance,
report closed-loop metrics, and dump world-frame trajectories.

The whole rollout is one jitted scan (cld_tpu.sim.env.simulate): the policy
below renders nothing on the host — observation -> context encoding ->
100-step guided sampling -> VAE decode -> unicycle actions all happen inside
the scan body.

Usage:
    python rollout.py --vae-ckpt runs/vae/ckpt_final --dm-ckpt runs/dm/ckpt_final \
        --num-scenes 2 --agents-per-scene 4 --guidance speed_limit:15
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.algos.dm import sample_traj
from cld_tpu.data.batch import get_current_states
from cld_tpu.guidance.losses import (
    GUIDANCE_LOSS_MAP,
    GuidanceContext,
)
from cld_tpu.guidance.perturbation import GuidanceSpec, make_perturbation_guidance
from cld_tpu.models.vae import convert_action_to_state_and_action
from cld_tpu.ops.dynamics import UnicycleParams
from cld_tpu.ops.geometry import world_from_agent_matrix
from cld_tpu.ops.normalization import TrajNormalizer
from cld_tpu.sim.env import SimConfig, simulate
from cld_tpu.sim.metrics import summarize_metrics
from cld_tpu.sim.scene import synthetic_scene_pack
from cld_tpu.utils.config import default_config, load_config


def parse_guidance_arg(spec: str):
    """'speed_limit:15,acc_limit:3' -> reference-style guidance configs."""
    configs = []
    if not spec:
        return configs
    for item in spec.split(","):
        name, _, val = item.partition(":")
        params = {}
        if name == "speed_limit" and val:
            params = {"speed_limit": float(val)}
        elif name == "acc_limit" and val:
            params = {"acc_limit": float(val)}
        elif name == "agent_collision":
            params = {}
        elif name == "map_collision":
            params = {}
        elif name == "target_speed" and val:
            params = {"target_speed": float(val)}  # broadcast later
        configs.append({"name": name, "params": params, "weight": 1.0})
    return configs


def make_dm_policy(cfg, args, pack, sim_cfg):
    """Build the jittable policy: obs -> (guided) latent sampling -> actions."""
    from cld_tpu.training.dm import DMTrainer
    from cld_tpu.training.vae import VAETrainer
    from train import _build_dm
    from cld_tpu.data.synthetic import synthetic_batch

    sample_batch = synthetic_batch(
        seed=0, batch_size=2, raster_size=sim_cfg.raster_size,
        hist_frames=sim_cfg.hist_frames,
    )
    dm_trainer, dm_state = _build_dm(cfg, args, sample_batch)
    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    normalizer = TrajNormalizer()
    num_samp = args.num_action_samples

    guidance_configs = parse_guidance_arg(args.guidance)

    def policy(obs, rng):
        Na = obs.curr_speed.shape[0]
        enc_rng, samp_rng = jax.random.split(rng)
        _, aux = dm_trainer.encode(obs, enc_rng)
        curr_states = get_current_states(obs)
        cond_rep = jnp.repeat(aux["cond_feat"], num_samp, axis=0)
        curr_rep = jnp.repeat(curr_states, num_samp, axis=0)

        def decode_fn(z):
            acts = dm_trainer.vae.apply(dm_trainer.vae_variables, z, cond_rep, method="decode")
            traj = convert_action_to_state_and_action(
                acts, curr_rep, dyn, normalizer, descaled_output=True
            )
            return traj.reshape(Na, num_samp, *traj.shape[1:])

        guidance_fn = None
        if guidance_configs:
            specs = []
            for gc in guidance_configs:
                params = dict(gc["params"])
                if gc["name"] == "target_speed":
                    params["target_speed"] = np.full(Na, params["target_speed"], np.float32)
                specs.append(
                    GuidanceSpec(GUIDANCE_LOSS_MAP[gc["name"]](**params), gc["weight"])
                )
            ctx = GuidanceContext(
                drivable_map=obs.drivable_map,
                raster_from_agent=obs.raster_from_agent,
                extent=obs.extent,
                curr_speed=obs.curr_speed,
                world_from_agent=world_from_agent_matrix(
                    jnp.zeros((Na, 2)), jnp.zeros((Na,))
                ),
                scene_index=pack.scene_index,
            )
            guidance_fn = make_perturbation_guidance(
                ctx, specs, decode_fn,
                lr=args.guidance_lr, grad_steps=args.guidance_steps,
                perturb_th=args.perturb_th,
            )

        out = sample_traj(
            dm_trainer.denoise_fn(dm_state.params),
            dm_trainer.schedule,
            samp_rng,
            aux["cond_feat"],
            cfg.algo.horizon,
            cfg.algo.vae.latent_size,
            num_samp=num_samp,
            guidance_fn=guidance_fn,
        )
        traj = decode_fn(out["pred_traj"])  # [Na, N, T, 6] descaled
        # take the first sample (filtration hook: choose_best_sample on
        # guidance losses; N=1 by default as in config num_samp)
        actions = traj[:, 0, :, 4:6]
        return actions

    return policy


def main():
    parser = argparse.ArgumentParser(description="cld_tpu closed-loop rollout")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--vae-ckpt", type=str, default=None)
    parser.add_argument("--dm-ckpt", type=str, default=None)
    parser.add_argument("--num-scenes", type=int, default=1)
    parser.add_argument("--agents-per-scene", type=int, default=4)
    parser.add_argument("--num-sim-steps", type=int, default=100)
    parser.add_argument("--n-step-action", type=int, default=5)
    parser.add_argument("--raster-size", type=int, default=None)
    parser.add_argument("--num-action-samples", type=int, default=1)
    parser.add_argument("--guidance", type=str, default="",
                        help="e.g. 'speed_limit:15,agent_collision'")
    parser.add_argument("--guidance-lr", type=float, default=0.3)
    parser.add_argument("--guidance-steps", type=int, default=1)
    parser.add_argument("--perturb-th", type=float, default=1.0)
    parser.add_argument("--output", type=str, default="rollout_out")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    cfg = load_config(args.config) if args.config else default_config().lock()
    raster = args.raster_size or cfg.env.rasterizer.raster_size
    sim_cfg = SimConfig(
        num_simulation_steps=args.num_sim_steps,
        n_step_action=args.n_step_action,
        hist_frames=cfg.algo.history_num_frames,
        raster_size=raster,
        pixel_size=cfg.env.rasterizer.pixel_size,
        dyn=UnicycleParams.from_config(cfg.algo.dynamics),
    )
    pack = synthetic_scene_pack(
        seed=args.seed,
        num_scenes=args.num_scenes,
        agents_per_scene=args.agents_per_scene,
        sim_steps=args.num_sim_steps,
    )
    policy = make_dm_policy(cfg, args, pack, sim_cfg)

    print(
        f"rollout: {pack.num_agents} agents, {sim_cfg.num_replans} replans x "
        f"{sim_cfg.n_step_action} steps, guidance={args.guidance or 'none'}",
        flush=True,
    )
    run = jax.jit(lambda rng: simulate(pack, policy, rng, sim_cfg))
    t0 = time.perf_counter()
    state, traj = run(jax.random.key(args.seed))
    traj.block_until_ready()
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, traj = run(jax.random.key(args.seed + 1))
    traj.block_until_ready()
    steady = time.perf_counter() - t0

    metrics = summarize_metrics(pack, state, sim_cfg)
    agent_steps_per_sec = pack.num_agents * sim_cfg.num_simulation_steps / steady
    metrics["wall_clock_s"] = steady
    metrics["agent_steps_per_sec"] = agent_steps_per_sec
    metrics["compile_and_first_run_s"] = compile_and_run
    print(json.dumps(metrics, indent=2))

    os.makedirs(args.output, exist_ok=True)
    np.savez(
        os.path.join(args.output, "trajectories.npz"),
        trajectories=np.asarray(traj),
        controlled_mask=np.asarray(pack.controlled_mask),
        scene_index=np.asarray(pack.scene_index),
    )
    print(f"saved trajectories -> {args.output}/trajectories.npz")


if __name__ == "__main__":
    main()
