"""Regression tests for rollout.py's post-rollout report helpers on
multi-scene packs whose map origins differ per scene.

Real-scene packs carry a distinct world map + origin per scene
(`sim/scene.py:scene_pack_from_shards`); the simulator indexes them
per-agent (`sim/env.py:122`), and the report path must too. The invariance
property tested here: translating one scene's map origin together with its
agents is a world-frame relabeling — every scene-local quantity (occupancy
coverage/off-road mass, map-collision satisfaction) must be unchanged.
The pre-fix report anchored everything to scene 0's origin and broke this.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import rollout as rollout_cli
from cld_tpu.guidance.losses import MapCollisionLoss
from cld_tpu.guidance.perturbation import GuidanceSpec
from cld_tpu.ops.geometry import transform_points
from cld_tpu.sim.env import SimConfig
from cld_tpu.sim.scene import synthetic_scene_pack

SHIFT = (303.0, -151.5)  # scene-1 world translation (not grid-aligned)


def _base_pack():
    pack = synthetic_scene_pack(
        seed=0, num_scenes=2, agents_per_scene=4, sim_steps=10,
        world_map_size=128,
    )
    # park one agent per scene straddling the road edge so the map-collision
    # satisfaction metric is NONZERO (a fully-on-road rollout scores 0 under
    # both the fixed and the broken transform — no signal)
    init = np.asarray(pack.init_states).copy()
    init[1::4, 1] = 6.8  # road_half_width=7.0, extent width 2.0
    gt = np.asarray(pack.gt_states).copy()
    gt[1::4, :, 1] += 6.8 - np.asarray(pack.init_states)[1::4, 1:2]
    return pack._replace(
        init_states=jnp.asarray(init), gt_states=jnp.asarray(gt)
    )


def _shifted_pack(base):
    """Scene 1's origin AND its agents translated by SHIFT: scene-local
    geometry is identical to `base`."""
    shift = np.asarray(SHIFT, np.float32)
    scene1 = np.asarray(base.scene_index) == 1
    init = np.asarray(base.init_states).copy()
    init[scene1, :2] += shift
    origins = np.asarray(base.map_origin).copy()
    origins[1] += shift
    gt = np.asarray(base.gt_states).copy()
    gt[scene1, :, :2] += shift
    return base._replace(
        init_states=jnp.asarray(init),
        map_origin=jnp.asarray(origins),
        gt_states=jnp.asarray(gt),
    )


def _executed_traj(pack):
    return np.asarray(pack.gt_states).transpose(1, 0, 2)  # [T+1, Na, 4]


def test_raster_from_world_uses_per_scene_origin():
    pack = _shifted_pack(_base_pack())
    rfw = rollout_cli.raster_from_world_per_agent(pack)
    pos = pack.init_states[:, None, :2]  # [Na, 1, 2]
    pix = np.asarray(transform_points(pos, rfw))[:, 0]
    org = np.asarray(pack.map_origin)[np.asarray(pack.scene_index)]
    expect = (np.asarray(pack.init_states)[:, :2] - org) / pack.map_resolution
    np.testing.assert_allclose(pix, expect, atol=1e-3)


def test_guidance_satisfaction_invariant_to_scene_origin_shift():
    base = _base_pack()
    shifted = _shifted_pack(base)
    sim_cfg = SimConfig(num_simulation_steps=10, raster_size=64)
    specs = [GuidanceSpec(MapCollisionLoss(), 1.0)]
    rep_b = rollout_cli.guidance_satisfaction_report(
        base, _executed_traj(base), sim_cfg, specs
    )
    rep_s = rollout_cli.guidance_satisfaction_report(
        shifted, _executed_traj(shifted), sim_cfg, specs
    )
    assert rep_b  # one entry per rule
    for k, v in rep_b.items():
        assert v > 0.0, "edge-straddling agents must register map collision"
        assert rep_s[k] == pytest.approx(v, rel=1e-3, abs=1e-5)


def test_guidance_metrics_nan_out_unaffected_agents():
    """Agents outside a rule's agent_mask report NaN (excluded from the
    nanmean aggregation), matching the reference's per-rule agent scoping
    (guidance_metrics.py:896-930)."""
    from cld_tpu.guidance.metrics import executed_traj_from_states, guidance_metrics
    from cld_tpu.guidance.losses import GuidanceContext, TargetSpeedLoss

    pack = _base_pack()
    traj = _executed_traj(pack)
    executed = executed_traj_from_states(jnp.asarray(traj))
    Na = pack.num_agents
    mask = np.zeros(Na, bool)
    mask[:2] = True
    specs = [GuidanceSpec(
        TargetSpeedLoss(target_speed=np.zeros(Na, np.float32)), 1.0,
        agent_mask=jnp.asarray(mask),
    )]
    ctx = GuidanceContext(
        drivable_map=pack.world_map[pack.scene_index, :, :, 0],
        raster_from_agent=rollout_cli.raster_from_world_per_agent(pack),
        extent=pack.extent,
        curr_speed=pack.init_states[:, 2],
        world_from_agent=jnp.broadcast_to(jnp.eye(3), (Na, 3, 3)),
        scene_index=pack.scene_index,
    )
    vals = next(iter(guidance_metrics(specs, executed, ctx).values()))
    assert np.isfinite(vals[:2]).all()
    assert np.isnan(vals[2:]).all()


def test_occupancy_report_invariant_to_scene_origin_shift():
    base = _base_pack()
    shifted = _shifted_pack(base)
    occ_b = rollout_cli.occupancy_report(base, _executed_traj(base))
    occ_s = rollout_cli.occupancy_report(shifted, _executed_traj(shifted))
    assert occ_b["occupied_cells"] > 0
    for k, v in occ_b.items():
        assert occ_s[k] == pytest.approx(v, rel=1e-4, abs=1e-6)
