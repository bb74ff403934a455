"""Multi-device SPMD tests on the 8-device virtual mesh: sharded execution
must match single-device numerics, for training and the closed-loop sim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from cld_tpu.policies.hardcoded import constant_policy
from cld_tpu.sim.env import SimConfig, simulate
from cld_tpu.sim.scene import synthetic_scene_pack
from cld_tpu.training.vae import VAETrainer
from cld_tpu.utils.registry import get_registered_experiment_config


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_vae_train_step_sharded_matches_single():
    cfg = get_registered_experiment_config("cld_smoke")
    batch = synthetic_batch(seed=0, batch_size=8, raster_size=64)
    trainer = VAETrainer(cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    rng = jax.random.key(1)

    _, m_single = trainer.train_step(state, batch, rng)

    mesh = make_mesh()
    sharded_batch = shard_batch(batch, mesh)
    sharded_state = replicate(state, mesh)
    _, m_sharded = trainer.train_step(sharded_state, sharded_batch, rng)

    # the global loss (mean over the sharded batch) matches single-device
    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_single["loss"]), rtol=2e-4
    )


def test_simulate_sharded_over_agents():
    """The closed-loop scan runs with the agent axis sharded over the mesh
    (cross-device pairwise collision terms ride XLA collectives)."""
    pack = synthetic_scene_pack(seed=0, num_scenes=4, agents_per_scene=2, sim_steps=10)
    cfg = SimConfig(num_simulation_steps=10, n_step_action=5, raster_size=32, hist_frames=4)
    policy = constant_policy(0.0, 0.0)

    state_single, traj_single = simulate(pack, policy, jax.random.key(0), cfg)

    mesh = make_mesh()
    # shard the per-agent leaves (Na = 8 -> 1 agent/device); scene-level
    # maps stay replicated (their leading dim is num_scenes, not agents)
    sharding = batch_sharding(mesh)
    sharded_pack = pack._replace(
        init_states=jax.device_put(pack.init_states, sharding),
        scene_index=jax.device_put(pack.scene_index, sharding),
        controlled_mask=jax.device_put(pack.controlled_mask, sharding),
        replay_actions=jax.device_put(pack.replay_actions, sharding),
        extent=jax.device_put(pack.extent, sharding),
    )
    state_sharded, traj_sharded = jax.jit(
        lambda rng: simulate(sharded_pack, policy, rng, cfg)
    )(jax.random.key(0))

    np.testing.assert_allclose(
        np.asarray(traj_sharded), np.asarray(traj_single), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_sharded.collision_steps),
        np.asarray(state_single.collision_steps),
    )
