#!/usr/bin/env python
"""Quickstart: the full cld_tpu pipeline in one script, no external data.

Runs on CPU or TPU: synthetic scenes -> VAE stage -> latent-DM stage ->
guided sampling -> PPO collection/update -> closed-loop rollout with an
adversarial collision-attack rule -> renders.

    python examples/quickstart.py          # ~5-10 min incl. compiles
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS explicitly (the axon TPU plugin overrides the env var)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.guidance.heuristics import heuristic_collision_attack
from cld_tpu.policies.hardcoded import constant_policy
from cld_tpu.sim.env import SimConfig, simulate
from cld_tpu.sim.metrics import summarize_metrics
from cld_tpu.sim.scene import synthetic_scene_pack
from cld_tpu.training.dm import DMTrainer
from cld_tpu.training.ppo import PPOTrainer, buffer_init
from cld_tpu.training.vae import VAETrainer
from cld_tpu.utils.registry import get_registered_experiment_config
from cld_tpu.viz.render import render_scene_rollout


def main():
    cfg = get_registered_experiment_config("cld_smoke")
    rng = jax.random.key(0)
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=64,
                            hist_frames=cfg.algo.history_num_frames)

    print("== stage 1: VAE ==")
    vae = VAETrainer(cfg)
    vae_state = vae.init_state(rng, batch)
    for step in range(12):
        vae_state, m = vae.train_step(vae_state, batch, rng)
    print(f"  vae loss {float(m['loss']):.4f} (recon {float(m['recon']):.4f})")

    print("== stage 2: latent DM (frozen VAE) ==")
    vae_vars = {"params": vae_state.params, "batch_stats": vae_state.batch_stats}
    dm = DMTrainer(cfg, vae_vars)
    dm_state = dm.init_state(jax.random.key(1))
    for step in range(12):
        dm_state, m = dm.train_step(dm_state, batch, rng)
    print(f"  dm eps-MSE {float(m['loss']):.4f}")

    print("== stage 3: PPO on safety rewards ==")
    ppo = PPOTrainer(cfg, dm)
    buf = buffer_init(cfg.algo.buffer_max, cfg.algo.horizon,
                      cfg.algo.vae.latent_size, cfg.algo.cond_feat_dim)
    for step in range(4):
        buf, m = ppo.collect_step(dm_state, buf, batch, jax.random.fold_in(rng, step))
    dm_state, pm = ppo.ppo_update(dm_state, buf, jax.random.key(2))
    print(f"  reward {float(m['reward']):.3f}, ppo loss {float(pm['loss']):.4f}, "
          f"clip_fraction {float(pm['clip_fraction']):.2f}")

    print("== closed loop: adversarial collision attack ==")
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=4, sim_steps=40)
    sim_cfg = SimConfig(num_simulation_steps=40, n_step_action=5,
                        raster_size=64, hist_frames=cfg.algo.history_num_frames)
    # mock policy keeps the demo fast; swap in rollout.py's make_dm_policy
    # (optionally with guidance specs like heuristic_collision_attack(0, 2))
    # for the trained guided-diffusion policy
    state, traj = jax.jit(
        lambda r: simulate(pack, constant_policy(0.0, 0.0), r, sim_cfg)
    )(jax.random.key(3))
    metrics = summarize_metrics(pack, state, sim_cfg)
    print(f"  closed-loop metrics: {metrics}")

    out = os.path.join(os.path.dirname(__file__), "quickstart_rollout.png")
    render_scene_rollout(pack, np.asarray(traj), out_path=out)
    print(f"  render -> {out}")
    print("done.")


if __name__ == "__main__":
    main()
