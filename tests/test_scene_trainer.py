"""Scene-centric diffusion trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.scene_batch import SceneBatch, synthetic_scene_batch
from cld_tpu.training.scene_dm import SceneDMTrainer, scene_gt_trajectories
from cld_tpu.utils.registry import get_registered_experiment_config


@pytest.fixture(scope="module")
def setup():
    cfg = get_registered_experiment_config("cld_smoke").unlock()
    cfg.algo.n_diffusion_steps = 5
    cfg.algo.scene_width = 32
    cfg.algo.scene_layers = 2
    cfg.algo.scene_cond_dim = 16
    cfg.algo.history_num_frames = 4
    batch = synthetic_scene_batch(seed=0, batch_size=2, num_agents=4,
                                  hist_frames=4, horizon=16)
    trainer = SceneDMTrainer(cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    return trainer, state, batch


def test_scene_gt_trajectories_consistent():
    batch = synthetic_scene_batch(seed=1, batch_size=1, num_agents=3,
                                  hist_frames=4, horizon=16)
    x0 = scene_gt_trajectories(batch)
    assert x0.shape == (1, 3, 16, 6)
    assert np.isfinite(np.asarray(x0)).all()
    # scaled GT should be roughly standardized (O(1) magnitudes)
    assert np.abs(np.asarray(x0)).max() < 30


def test_scene_trainer_improves(setup):
    trainer, state, batch = setup
    rng = jax.random.key(1)
    state1, m0 = trainer.train_step(state, batch, rng)
    for _ in range(12):
        state1, m = trainer.train_step(state1, batch, rng)
    assert float(m["loss"]) < float(m0["loss"])


def test_scene_sampling(setup):
    trainer, state, batch = setup
    traj = jax.jit(lambda r: trainer.sample(state, batch, r))(jax.random.key(2))
    assert traj.shape == (2, 4, 16, 6)
    assert np.isfinite(np.asarray(traj)).all()
    # padded agents (mask False) produce descale(0) constants, real agents vary
    real_spread = np.asarray(traj[:, :3, :, :2]).std()
    assert real_spread > 0.1


def test_scene_policy_closed_loop(setup):
    """The scene model drives the simulator end-to-end: flattened obs are
    regrouped per scene, jointly sampled, scattered back."""
    from cld_tpu.policies.scene_policy import scene_dm_policy
    from cld_tpu.sim.env import SimConfig, simulate
    from cld_tpu.sim.scene import synthetic_scene_pack

    trainer, state, _ = setup
    Ns, A = 2, 4
    pack = synthetic_scene_pack(seed=3, num_scenes=Ns, agents_per_scene=A, sim_steps=10)
    cfg = SimConfig(num_simulation_steps=10, n_step_action=5, raster_size=32,
                    hist_frames=4)
    policy = scene_dm_policy(trainer, state, pack, Ns, A, horizon=16)
    final, traj = jax.jit(lambda r: simulate(pack, policy, r, cfg))(jax.random.key(0))
    assert traj.shape == (10, Ns * A, 4)
    assert np.isfinite(np.asarray(traj)).all()
