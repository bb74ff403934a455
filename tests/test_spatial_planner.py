"""Spatial goal planner + occupancy network tests (reference
`algos.py:258-470` SpatialPlanner, `metric_algos.py:120-300` OccupancyMetric)."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.utils.config import default_config


def small_cfg():
    cfg = default_config()
    cfg.env.rasterizer.raster_size = 32
    cfg.train.training.batch_size = 4
    return cfg


def test_goal_supervision_roundtrip():
    """Goal supervision picks the LAST available frame and its raster pixel
    is consistent with raster_from_agent."""
    from cld_tpu.models.spatial_planner import (
        get_spatial_goal_supervision, last_available_index)
    from cld_tpu.ops.geometry import transform_points

    batch = synthetic_batch(seed=0, batch_size=4, raster_size=32)
    av = batch.target_availabilities
    av = av.at[1, 30:].set(0.0)  # truncate agent 1's future
    batch = batch._replace(target_availabilities=av)
    idx = last_available_index(batch.target_availabilities)
    assert int(idx[1]) == 29
    sup = get_spatial_goal_supervision(batch)
    assert sup["goal_spatial_map"].shape == (4, 32, 32)
    np.testing.assert_allclose(np.asarray(sup["goal_spatial_map"].sum(axis=(1, 2))), 1.0)
    # pixel + residual reconstructs the raster-space goal
    recon = sup["goal_position_pixel"] + sup["goal_position_residual"]
    direct = transform_points(sup["goal_position"][:, None], batch.raster_from_agent)[:, 0]
    direct = jnp.clip(direct, 0.0, 32 - 1e-5)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(direct), atol=1e-4)


def test_spatial_planner_trains_and_decodes():
    from cld_tpu.training.zoo import ZooTrainer

    cfg = small_cfg()
    trainer = ZooTrainer(cfg, "spatial_planner")
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=32)
    state = trainer.init_state(jax.random.key(0), batch)
    m0 = None
    for i in range(3):
        state, m = trainer.train_step(state, batch, jax.random.key(1))
        m0 = m0 or m
    assert jnp.isfinite(m["loss"])
    assert float(m["loss"]) < float(m0["loss"])  # learns on a fixed batch
    assert "goal_pos_err" in m


def test_decode_respects_drivable_mask():
    from cld_tpu.models.spatial_planner import decode_spatial_prediction

    B, H, W = 2, 16, 16
    pred = jnp.zeros((B, H, W, 4))
    # put the peak at an (undrivable) pixel
    pred = pred.at[:, 3, 5, 0].set(10.0)
    pred = pred.at[:, 10, 12, 0].set(5.0)
    rfa = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    out = decode_spatial_prediction(pred, rfa)
    np.testing.assert_array_equal(np.asarray(out["pixel"][0]), [5, 3])
    drivable = jnp.ones((B, H, W)).at[:, 3, 5].set(0.0)
    out2 = decode_spatial_prediction(pred, rfa, drivable_map=drivable)
    np.testing.assert_array_equal(np.asarray(out2["pixel"][0]), [12, 10])


def test_occupancy_trains_and_scores():
    from cld_tpu.training.zoo import ZooTrainer

    cfg = small_cfg()
    trainer = ZooTrainer(cfg, "occupancy")
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=32)
    state = trainer.init_state(jax.random.key(0), batch)
    state, m0 = trainer.train_step(state, batch, jax.random.key(1))
    for _ in range(2):
        state, m = trainer.train_step(state, batch, jax.random.key(1))
    assert jnp.isfinite(m["loss"])
    assert float(m["loss"]) < float(m0["loss"])
    assert 0.0 <= float(m["indep_likelihood"]) <= 1.0


def test_registry_has_planner_and_occupancy():
    from cld_tpu.utils.registry import get_registered_experiment_config

    cfg = get_registered_experiment_config("nusc_spatial_planner")
    assert cfg.algo.name == "spatial_planner"
    cfg = get_registered_experiment_config("nusc_occupancy")
    assert cfg.algo.name == "occupancy"


def test_agent_predictor_trains():
    """MATrafficModel capability: ego + neighbor futures from one raster."""
    from cld_tpu.training.zoo import ZooTrainer

    cfg = small_cfg()
    trainer = ZooTrainer(cfg, "agent_predictor")
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=32)
    state = trainer.init_state(jax.random.key(0), batch)
    state, m0 = trainer.train_step(state, batch, jax.random.key(1))
    for _ in range(3):
        state, m = trainer.train_step(state, batch, jax.random.key(1))
    assert jnp.isfinite(m["loss"])
    assert float(m["loss"]) < float(m0["loss"])
    assert {"ego_mse", "yaw_mse", "neigh_mse"} <= set(m)


def test_tree_vae_trains_and_samples():
    """TreeVAETrafficModel capability: staged CVAE, chained segments, prior
    tree sampling."""
    from cld_tpu.training.zoo import ZooTrainer

    cfg = small_cfg()
    trainer = ZooTrainer(cfg, "tree_vae")
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=32)
    state = trainer.init_state(jax.random.key(0), batch)
    state, m0 = trainer.train_step(state, batch, jax.random.key(1))
    for _ in range(3):
        state, m = trainer.train_step(state, batch, jax.random.key(1))
    assert jnp.isfinite(m["loss"]) and float(m["loss"]) < float(m0["loss"])

    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    samples = trainer.model.apply(
        variables, batch, 3, method="sample", rngs={"sample": jax.random.key(2)}
    )
    assert samples.shape == (4, 3, 20, 6)
    assert bool(jnp.isfinite(samples).all())
    # segments chain: position is continuous across the stage boundary
    jump = jnp.linalg.norm(samples[..., 10, :2] - samples[..., 9, :2], axis=-1)
    assert float(jump.max()) < 5.0


def test_bc_ec_trains_and_ec_conditions():
    """bc_ec: neighbor heads condition on the ego plan; changing the plan
    changes the neighbor predictions."""
    from cld_tpu.training.zoo import ZooTrainer

    cfg = small_cfg()
    trainer = ZooTrainer(cfg, "bc_ec")
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=32)
    state = trainer.init_state(jax.random.key(0), batch)
    state, m = trainer.train_step(state, batch, jax.random.key(1))
    assert jnp.isfinite(m["loss"])

    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    plan_a = batch.target_positions
    plan_b = plan_a + 5.0
    out_a = trainer.model.apply(variables, batch, cond_traj=plan_a)
    out_b = trainer.model.apply(variables, batch, cond_traj=plan_b)
    assert float(jnp.abs(out_a["agent_positions"] - out_b["agent_positions"]).max()) > 1e-4


def test_transformer_gan_trains():
    """TransformerGAN: GAN objective with the transformer generator."""
    from cld_tpu.training.gan import GANTrainer
    from cld_tpu.utils.registry import get_registered_experiment_config

    cfg = get_registered_experiment_config("nusc_transformer_gan").unlock()
    cfg.env.rasterizer.raster_size = 32
    cfg.train.training.batch_size = 4
    trainer = GANTrainer(cfg)
    assert trainer.model.generator_arch == "transformer"
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=32)
    state = trainer.init_state(jax.random.key(0), batch)
    state, m = trainer.train_step(state, batch, jax.random.key(1))
    assert jnp.isfinite(m["d_loss"]) and jnp.isfinite(m["g_loss"])


def test_bc_gc_trains_and_goal_conditions():
    """bc_gc (goal-conditioned BC): trains on teacher-forced goals; a
    different commanded goal changes the plan."""
    from cld_tpu.training.zoo import ZooTrainer

    cfg = small_cfg()
    trainer = ZooTrainer(cfg, "bc_gc")
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=32)
    state = trainer.init_state(jax.random.key(0), batch)
    state, m0 = trainer.train_step(state, batch, jax.random.key(1))
    for _ in range(2):
        state, m = trainer.train_step(state, batch, jax.random.key(1))
    assert jnp.isfinite(m["loss"]) and float(m["loss"]) < float(m0["loss"])

    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    goal_a = jnp.tile(jnp.asarray([[10.0, 0.0, 0.0]]), (4, 1))
    goal_b = jnp.tile(jnp.asarray([[10.0, 20.0, 1.0]]), (4, 1))
    out_a = trainer.model.apply(variables, batch, goal=goal_a)
    out_b = trainer.model.apply(variables, batch, goal=goal_b)
    assert float(jnp.abs(out_a["trajectories"] - out_b["trajectories"]).max()) > 1e-4
