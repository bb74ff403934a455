"""Auxiliary subsystems: metric kernels, STL rules, sweeps, logger, codegen."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.ops.metrics import (
    batch_average_displacement_error,
    batch_detect_off_road,
    batch_detect_off_road_disk,
    batch_final_displacement_error,
    batch_pairwise_collision_rate,
    trajectory_diversity,
)
from cld_tpu.rules.stl import SpeedLimitRule, StopSignRule, always, eventually
from cld_tpu.utils.config import default_config
from cld_tpu.utils.experiment import ParamRange, ParamSearchPlan, find_checkpoint
from cld_tpu.utils.registry import get_registered_experiment_config


def test_ade_fde_oracle_vs_mean():
    gt = jnp.zeros((2, 10, 2))
    pred = jnp.zeros((2, 3, 10, 2))
    pred = pred.at[:, 0].add(1.0).at[:, 1].add(2.0).at[:, 2].add(3.0)
    ade_mean = np.asarray(batch_average_displacement_error(gt, pred, mode="mean"))
    ade_oracle = np.asarray(batch_average_displacement_error(gt, pred, mode="oracle"))
    np.testing.assert_allclose(ade_oracle, np.sqrt(2) * 1.0, rtol=1e-5)
    assert (ade_mean > ade_oracle).all()
    fde_o = np.asarray(batch_final_displacement_error(gt, pred, mode="oracle"))
    np.testing.assert_allclose(fde_o, np.sqrt(2), rtol=1e-5)


def test_pairwise_collision_rate():
    pos = jnp.zeros((3, 5, 2)).at[2, :, 0].set(100.0)  # agents 0,1 overlap
    extent = jnp.tile(jnp.array([4.0, 2.0, 1.7]), (3, 1))
    scene = jnp.zeros(3, jnp.int32)
    rate = float(batch_pairwise_collision_rate(pos, extent, scene))
    np.testing.assert_allclose(rate, 2 / 3, rtol=1e-5)
    # cross-scene overlaps don't count
    scene2 = jnp.array([0, 1, 2], jnp.int32)
    assert float(batch_pairwise_collision_rate(pos, extent, scene2)) == 0.0


def test_offroad_detection():
    from cld_tpu.data.synthetic import synthetic_batch

    b = synthetic_batch(seed=0, batch_size=2, raster_size=64)
    on = batch_detect_off_road(b.target_positions, b.drivable_map, b.raster_from_agent)
    assert float(on.sum()) == 0.0
    off = batch_detect_off_road(
        b.target_positions + jnp.array([0.0, 100.0]), b.drivable_map, b.raster_from_agent
    )
    assert float(off.mean()) == 1.0
    yaw = jnp.zeros(b.target_positions.shape[:2])
    disk = batch_detect_off_road_disk(
        b.target_positions, yaw, b.extent, b.drivable_map, b.raster_from_agent
    )
    assert disk.shape == b.target_positions.shape[:2]


def test_diversity():
    pred = jnp.zeros((1, 2, 5, 2)).at[0, 1, -1, 0].set(4.0)
    np.testing.assert_allclose(float(trajectory_diversity(pred)[0]), 4.0, rtol=1e-5)


def test_stl_rules():
    traj_slow = jnp.zeros((2, 20, 6)).at[..., 2].set(5.0)
    traj_fast = jnp.zeros((2, 20, 6)).at[..., 2].set(30.0)
    rule = SpeedLimitRule(speed_limit=15.0, temp=50.0)
    assert (np.asarray(rule.robustness(traj_slow)) > 0).all()
    assert (np.asarray(rule.robustness(traj_fast)) < 0).all()
    assert (np.asarray(rule.loss(traj_slow)) == 0).all()
    assert (np.asarray(rule.loss(traj_fast)) > 0).all()
    # robustness is differentiable
    g = jax.grad(lambda t: rule.loss(t).sum())(traj_fast)
    assert np.abs(np.asarray(g)).max() > 0

    # stop sign: trajectory that stops inside the box satisfies
    t = jnp.arange(20) * 0.1
    traj_stop = jnp.zeros((1, 20, 6))
    traj_stop = traj_stop.at[..., 0].set(jnp.minimum(15.0, 10 * t))
    traj_stop = traj_stop.at[..., 2].set(jnp.maximum(0.0, 10 - 10 * t))
    stop = StopSignRule(box_center=(15.0, 0.0), box_half=(5.0, 3.0), temp=50.0)
    assert float(stop.robustness(traj_stop)[0]) > 0
    traj_through = jnp.zeros((1, 20, 6)).at[..., 0].set(5 * t).at[..., 2].set(5.0)
    assert float(stop.robustness(traj_through)[0]) < 0


def test_always_eventually_soft_semantics():
    sig = jnp.array([[1.0, 2.0, -0.5, 3.0]])
    assert float(always(sig, temp=100.0)[0]) == pytest.approx(-0.5, abs=0.01)
    assert float(eventually(sig, temp=100.0)[0]) == pytest.approx(3.0, abs=0.01)


def test_param_sweep():
    cfg = default_config()
    plan = ParamSearchPlan(
        cfg,
        [
            ParamRange("algo.base_dim", [16, 32]),
            ParamRange("algo.vae.latent_size", [2, 4], alias="latent"),
        ],
    )
    runs = list(plan.generate())
    assert len(runs) == 4
    names = [n for n, _ in runs]
    assert "base_dim=16_latent=2" in names
    cfgs = {n: c for n, c in runs}
    assert cfgs["base_dim=16_latent=4"].algo.base_dim == 16
    assert cfgs["base_dim=16_latent=4"].algo.vae.latent_size == 4
    # base untouched
    assert cfg.algo.base_dim == 32


def test_find_checkpoint(tmp_path):
    d = tmp_path / "runs" / "dm"
    (d / "ckpt_200").mkdir(parents=True)
    (d / "ckpt_final").mkdir()
    assert str(find_checkpoint(str(tmp_path), "final")).endswith("ckpt_final")
    with pytest.raises(FileNotFoundError):
        find_checkpoint(str(tmp_path), "nope")


def test_registry():
    cfg = get_registered_experiment_config("cld_smoke")
    assert cfg.algo.base_dim == 8
    with pytest.raises(KeyError):
        get_registered_experiment_config("nonexistent")


def test_registry_covers_reference_names():
    """Every named experiment of the reference registry
    (`registry.py:92-443`) resolves here, builds a locked config, and its
    algo/mode is reachable by train.py."""
    from cld_tpu.utils.registry import EXP_CONFIG_REGISTRY
    from cld_tpu.training.zoo import ALGO_FACTORY

    reference_names = [
        "l5_bc", "l5_gan", "l5_bc_gc", "l5_spatial_planner",
        "l5_agent_predictor", "l5_vae", "l5_bc_ec", "l5_discrete_vae",
        "l5_tree_vae", "l5_transformer", "l5_transformer_gan", "l5_ebm",
        "l5_occupancy", "l5_diff",
        "nusc_bc", "nusc_bc_gc", "nusc_spatial_planner", "nusc_vae",
        "nusc_discrete_vae", "nusc_tree_vae", "nusc_diff_stack",
        "nusc_agent_predictor", "nusc_gan", "nusc_occupancy", "nusc_diff",
        "eupeds_bc", "eupeds_vae", "orca_bc", "orca_diff",
        "trajdata_nusc_bc", "trajdata_nusc_vae",
        "trajdata_nusc_spatial_planner", "trajdata_nusc_agent_predictor",
        "trajdata_nusc_diff", "trajdata_nusc_strive",
        "trajdata_l5_bc", "trajdata_l5_vae", "trajdata_l5_spatial_planner",
        "trajdata_l5_agent_predictor", "trajdata_l5_diff",
        "nusc_ped_diff", "nusc_all_diff",
        "trajdata_nuplan_bc", "trajdata_nuplan_spatial_planner",
        "trajdata_nuplan_agent_predictor", "trajdata_nuplan_diff",
        "trajdata_nuplan_ped_diff", "trajdata_nuplan_all_diff",
        "trajdata_nusc_scene_diff", "trajdata_nuplan_scene_diff",
        "trajdata_drivesim_diff",
    ]
    missing = [n for n in reference_names if n not in EXP_CONFIG_REGISTRY]
    assert not missing, f"reference registry names missing: {missing}"

    train_modes = {"vae", "dm", "ppo", "test", "scene_dm", "ebm", "zoo", "gan"}
    for name in EXP_CONFIG_REGISTRY:
        cfg = get_registered_experiment_config(name)
        assert cfg.train.mode in train_modes, (name, cfg.train.mode)
        if cfg.train.mode == "zoo":
            assert cfg.algo.name in ALGO_FACTORY, (name, cfg.algo.name)
        # locked: typo keys rejected
        with pytest.raises(KeyError):
            cfg.definitely_not_a_key = 1

    # dataset presets carry the reference env knobs
    eupeds = get_registered_experiment_config("eupeds_bc")
    assert eupeds.env.rasterizer.num_sem_layers == 0
    assert eupeds.env.data_generation_params.trajdata_incl_map is False
    assert eupeds.algo.step_time == 0.4 and eupeds.algo.future_num_frames == 12
    orca = get_registered_experiment_config("orca_diff")
    assert orca.env.rasterizer.num_sem_layers == 2
    assert orca.env.data_generation_params.trajdata_only_types == ["pedestrian"]


def test_rollout_logger_hdf5(tmp_path):
    import h5py

    from cld_tpu.sim.logger import RolloutLogger

    log = RolloutLogger()
    traj = np.random.default_rng(0).normal(size=(20, 4, 4))
    log.log_episode(
        traj,
        scene_index=np.array([0, 0, 1, 1]),
        controlled_mask=np.array([True, False, True, False]),
        metrics={"collision_rate": 0.25},
    )
    path = log.save_hdf5(str(tmp_path / "exp.h5"))
    with h5py.File(path) as f:
        ep = f["episode_0000"]
        assert "scene_000000" in ep and "scene_000001" in ep
        assert ep["scene_000000"]["centroid"].shape == (20, 2, 2)
        assert "collision_rate" in ep.attrs["metrics"]


def test_guidance_codegen():
    from cld_tpu.guidance.codegen import loss_from_source, query_llm_for_loss

    src = """
def guidance_loss(x, ctx, agt_mask=None):
    return jnp.mean(jnp.abs(x[..., 2]), axis=-1)
"""
    spec = loss_from_source(src, weight=2.0)
    x = jnp.ones((2, 3, 5, 6))
    out = spec.loss(x, None)
    assert out.shape == (2, 3)
    with pytest.raises(RuntimeError):
        query_llm_for_loss("never collide")
    # with a stubbed LLM it compiles the returned source
    spec2 = query_llm_for_loss("slow", query_fn=lambda prompt: src)
    assert spec2.loss(x, None).shape == (2, 3)
