"""Batch validation + fault-guard tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.data.validation import check_batch_consistency
from cld_tpu.policies.hardcoded import constant_policy
from cld_tpu.policies.common import Action
from cld_tpu.sim.env import SimConfig, simulate
from cld_tpu.sim.scene import synthetic_scene_pack


def test_synthetic_batch_is_consistent():
    batch = synthetic_batch(seed=0, batch_size=3, raster_size=64)
    assert check_batch_consistency(batch) == []


def test_validation_catches_problems():
    batch = synthetic_batch(seed=0, batch_size=2, raster_size=32)
    bad = batch._replace(curr_speed=batch.curr_speed.at[0].set(jnp.nan))
    probs = check_batch_consistency(bad)
    assert any("non-finite" in p for p in probs)

    shifted = batch._replace(history_positions=batch.history_positions + 5.0)
    probs = check_batch_consistency(shifted)
    assert any("origin" in p for p in probs)

    warped = batch._replace(target_positions=batch.target_positions * 3.0)
    probs = check_batch_consistency(warped)
    assert any("dynamics-consistent" in p for p in probs)


def test_sim_nan_action_guard():
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=2, sim_steps=10)
    cfg = SimConfig(num_simulation_steps=10, n_step_action=5, raster_size=32, hist_frames=4)

    def nan_policy(obs, rng):
        B = obs.curr_speed.shape[0]
        return Action(
            positions=jnp.zeros((B, 52, 2)),
            yaws=jnp.zeros((B, 52, 1)),
            controls=jnp.full((B, 52, 2), jnp.nan),
        )

    state, traj = simulate(pack, nan_policy, jax.random.key(0), cfg)
    assert np.isfinite(np.asarray(traj)).all()  # world state stays finite


def test_trainer_skips_nonfinite_loss():
    from cld_tpu.training.vae import VAETrainer
    from cld_tpu.utils.registry import get_registered_experiment_config

    cfg = get_registered_experiment_config("cld_smoke")
    batch = synthetic_batch(seed=0, batch_size=2, raster_size=64)
    trainer = VAETrainer(cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    poisoned = batch._replace(curr_speed=jnp.full_like(batch.curr_speed, jnp.nan))
    new_state, m = trainer.train_step(state, poisoned, jax.random.key(1))
    assert float(m["skipped_nonfinite"]) == 1.0
    # parameters unchanged
    diff = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
        )
    )
    assert diff == 0.0
    # and a clean batch still updates
    new_state2, m2 = trainer.train_step(state, batch, jax.random.key(1))
    assert float(m2["skipped_nonfinite"]) == 0.0
