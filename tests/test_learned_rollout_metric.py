"""EBM trainer stage + learned closed-loop realism metric on a rollout
(env_metrics.py:649-959 LearnedMetric; VERDICT missing #7)."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.sim.env import SimConfig, simulate
from cld_tpu.sim.learned_metrics import ebm_rollout_metric, ebm_rollout_scores
from cld_tpu.sim.scene import synthetic_scene_pack
from cld_tpu.training.ebm import EBMTrainer
from cld_tpu.utils.registry import get_registered_experiment_config


def test_ebm_trainer_step_and_resume_roundtrip(tmp_path):
    cfg = get_registered_experiment_config("cld_smoke")
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=64)
    trainer = EBMTrainer(cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    state1, m0 = trainer.train_step(state, batch, jax.random.key(1))
    for _ in range(6):
        state1, m = trainer.train_step(state1, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])  # InfoNCE on a fixed batch drops
    ev = trainer.eval_step(state1, batch)
    assert np.isfinite(float(ev["score_mean"]))


def test_ebm_rollout_metric_on_simulated_trajectory():
    cfg = get_registered_experiment_config("cld_smoke")
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=4, sim_steps=20)
    sim_cfg = SimConfig(
        num_simulation_steps=20, n_step_action=5, raster_size=64,
        hist_frames=cfg.algo.history_num_frames,
    )
    from cld_tpu.policies.hardcoded import constant_policy

    _, traj = jax.jit(
        lambda rng: simulate(pack, constant_policy(0.0, 0.0), rng, sim_cfg)
    )(jax.random.key(0))

    trainer = EBMTrainer(cfg)
    from cld_tpu.sim.env import init_sim_state, render_observation

    obs = render_observation(pack, init_sim_state(pack, sim_cfg), sim_cfg)
    state = trainer.init_state(jax.random.key(2), obs)

    scores = jax.jit(
        lambda tr: ebm_rollout_scores(
            pack, tr, trainer.score_fn(state), sim_cfg, horizon=8, stride=8
        )
    )(traj)
    assert scores.shape == (3, 4)  # anchors {0, 8, 16} x 4 agents
    assert bool(jnp.isfinite(scores).all())

    m = ebm_rollout_metric(pack, traj, trainer.score_fn(state), sim_cfg,
                           horizon=8, stride=8)
    assert np.isfinite(float(m["ebm_score_mean"]))
    assert m["ebm_score_per_agent"].shape == (4,)
