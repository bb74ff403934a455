"""Policy wrappers, hardcoded policies, guidance metrics/heuristics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.guidance.heuristics import compute_heuristic_guidance, heuristic_collision_attack
from cld_tpu.guidance.losses import (
    CollisionAttackLoss,
    GuidanceContext,
    KeepDistanceLoss,
    SocialGroupLoss,
)
from cld_tpu.guidance.metrics import executed_traj_from_states, guidance_metrics
from cld_tpu.guidance.perturbation import GuidanceSpec
from cld_tpu.ops.geometry import world_from_agent_matrix
from cld_tpu.policies.common import Action, action_from_trajectory
from cld_tpu.policies.hardcoded import constant_policy, gt_policy
from cld_tpu.policies.wrappers import (
    masked_policy,
    ou_perturbation_policy,
    pos2yaw_policy,
    with_kwargs,
)
from cld_tpu.sim.env import SimConfig, init_sim_state, simulate
from cld_tpu.sim.scene import synthetic_scene_pack


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(seed=0, batch_size=3, raster_size=32)


def make_ctx(B=3):
    batch = synthetic_batch(seed=0, batch_size=B, raster_size=32)
    return GuidanceContext(
        drivable_map=batch.drivable_map,
        raster_from_agent=batch.raster_from_agent,
        extent=batch.extent,
        curr_speed=batch.curr_speed,
        world_from_agent=world_from_agent_matrix(jnp.zeros((B, 2)), jnp.zeros(B)),
        scene_index=jnp.zeros(B, jnp.int32),
    )


def test_gt_policy_echoes_future(batch):
    a = gt_policy(batch, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(a.positions), np.asarray(batch.target_positions))


def test_masked_policy_selects(batch):
    p = masked_policy(
        jnp.array([True, False, True]),
        constant_policy(acc=1.0),
        constant_policy(acc=-1.0),
    )
    a = p(batch, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(a.controls[:, 0, 0]), [1.0, -1.0, 1.0])


def test_pos2yaw_policy(batch):
    def straight(obs, rng):
        T = 10
        pos = jnp.zeros((3, T, 2)).at[..., 1].set(jnp.arange(1, T + 1) * 0.5)  # +y motion
        return Action(positions=pos, yaws=jnp.zeros((3, T, 1)))

    a = pos2yaw_policy(straight, dt=0.1)(batch, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(a.yaws), np.pi / 2, atol=1e-5)


def test_ou_perturbation_changes_actions(batch):
    base = gt_policy
    pert = ou_perturbation_policy(base, sigma=(0.5, 0.5, 0.1))
    a0 = base(batch, jax.random.key(1))
    a1 = pert(batch, jax.random.key(1))
    diff = np.abs(np.asarray(a1.positions - a0.positions))
    assert diff.max() > 0.01
    # OU noise is temporally correlated: adjacent-step noise deltas are
    # smaller than white noise of the same magnitude would give
    noise = np.asarray(a1.positions - a0.positions)
    assert np.abs(np.diff(noise, axis=1)).mean() < np.abs(noise).mean() * 1.5


def test_keep_distance_and_attack_losses():
    ctx = make_ctx(B=3)
    T = 52
    t = jnp.arange(1, T + 1) * 0.1
    x = jnp.zeros((3, 1, T, 6))
    x = x.at[0, ..., 0].set(5 * t)  # agent 0 ahead
    x = x.at[1, ..., 0].set(5 * t)
    x = x.at[1, ..., 1].set(3.0)  # 3 m lateral offset
    x = x.at[2, ..., 0].set(5 * t)
    x = x.at[2, ..., 1].set(30.0)  # far away

    kd = KeepDistanceLoss(target_ind=1, ref_ind=0, min_dist=5.0, max_dist=15.0)
    loss = np.asarray(kd(x, ctx))
    assert loss[1, 0] > 0  # 3 m < min 5 m -> violated
    assert loss[0, 0] == 0 and loss[2, 0] == 0  # only target penalized

    atk = CollisionAttackLoss(attacker_ind=2, victim_ind=0)
    l_atk = np.asarray(atk(x, ctx))
    np.testing.assert_allclose(l_atk[2, 0], 30.0, atol=0.1)  # min distance
    # gradient pulls attacker toward victim
    g = jax.grad(lambda x: atk(x, ctx).sum())(x)
    assert float(np.asarray(g[2, ..., 1]).sum()) > 0  # descent lowers y toward 0


def test_social_group_loss():
    ctx = make_ctx(B=3)
    x = jnp.zeros((3, 1, 52, 6))
    x = x.at[1, ..., 1].set(20.0)  # member 1 far from the group
    sg = SocialGroupLoss(group=(0, 1), social_dist=2.0)
    loss = np.asarray(sg(x, ctx))
    assert loss[1, 0] > loss[0, 0] - 1e-6
    assert loss[2, 0] == 0  # non-member untouched


def test_guidance_metrics_on_executed_rollout():
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=3, sim_steps=20)
    cfg = SimConfig(num_simulation_steps=20, n_step_action=5, raster_size=32, hist_frames=4)
    state, traj = simulate(pack, constant_policy(0.0, 0.0), jax.random.key(0), cfg)
    executed = executed_traj_from_states(traj)
    assert executed.shape == (3, 1, 20, 6)
    ctx = GuidanceContext(
        drivable_map=pack.world_map[pack.scene_index, :, :, 0],
        raster_from_agent=jnp.tile(jnp.eye(3)[None], (3, 1, 1)),
        extent=pack.extent,
        curr_speed=pack.init_states[:, 2],
        world_from_agent=world_from_agent_matrix(jnp.zeros((3, 2)), jnp.zeros(3)),
        scene_index=pack.scene_index,
    )
    from cld_tpu.guidance.losses import SpeedLimitLoss

    specs = [GuidanceSpec(SpeedLimitLoss(speed_limit=0.1), weight=1.0)]
    m = guidance_metrics(specs, executed, ctx)
    assert "SpeedLimitLoss_0" in m
    assert (m["SpeedLimitLoss_0"] > 0).all()  # everyone exceeds 0.1 m/s


def test_heuristics_builders():
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=3, sim_steps=20)
    cfg = SimConfig(num_simulation_steps=20, n_step_action=5, raster_size=32, hist_frames=4)
    state = init_sim_state(pack, cfg)
    specs = compute_heuristic_guidance(
        ["target_speed", "agent_collision", "map_collision", "global_target_pos"],
        pack, state,
    )
    assert len(specs) == 4
    atk = heuristic_collision_attack(0, 1)
    assert atk.loss.attacker_ind == 0


def test_action_from_trajectory():
    traj = jnp.arange(2 * 4 * 6).reshape(2, 4, 6).astype(jnp.float32)
    a = action_from_trajectory(traj)
    np.testing.assert_allclose(np.asarray(a.positions), np.asarray(traj[..., :2]))
    np.testing.assert_allclose(np.asarray(a.controls), np.asarray(traj[..., 4:6]))


def test_hierarchical_policy_tracks_gt_plan():
    """GT plan (positions/yaws only) -> inverse-dynamics controls that
    re-integrate to the plan in closed loop."""
    from cld_tpu.policies.wrappers import hierarchical_policy
    from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics

    batch = synthetic_batch(seed=2, batch_size=2, raster_size=32)
    policy = hierarchical_policy(gt_policy)
    a = policy(batch, jax.random.key(0))
    assert a.controls is not None and a.controls.shape == (2, 52, 2)
    dyn = UnicycleParams(max_steer=0.5, max_yawvel=6.28, acce_lo=-10, acce_hi=8)
    curr = jnp.concatenate(
        [batch.history_positions[:, -1], batch.curr_speed[:, None],
         batch.history_yaws[:, -1]], axis=-1,
    )
    states = unicycle_forward_dynamics(dyn, curr, a.controls, 0.1)
    err = np.abs(np.asarray(states[..., :2]) - np.asarray(batch.target_positions))
    assert err.max() < 0.1  # tracked to within 10 cm over 5.2 s


# -- reference-format heuristic configs (scene_edit_utils.py param spellings) --


def _pack_and_state(num_scenes=1, agents=4):
    pack = synthetic_scene_pack(seed=0, num_scenes=num_scenes,
                                agents_per_scene=agents, sim_steps=30)
    cfg = SimConfig(num_simulation_steps=30, n_step_action=5, raster_size=32,
                    hist_frames=4)
    return pack, init_sim_state(pack, cfg)


def test_heuristic_speed_limit_stopped_scene_falls_back():
    """All-stopped scene: the quantile is undefined and the reference sets
    speed_limit = low_speed_th (`scene_edit_utils.py:538-540`) — not the
    15 m/s constructor default."""
    from cld_tpu.guidance.heuristics import heuristic_speed_limit

    pack, state = _pack_and_state()
    spec = heuristic_speed_limit(pack, state, speed_limit_quantile=0.9,
                                 low_speed_th=1000.0, fut_sec=1.0)
    assert spec.loss.speed_limit == 1000.0


def test_heuristic_dt_scales_future_windows():
    """fut_sec -> frames uses the sim dt (eupeds-style 0.4 s steps), not a
    hardcoded 10 Hz: 2 s of future is 5 frames at dt=0.4, 20 at dt=0.1."""
    from cld_tpu.guidance.heuristics import heuristic_target_speed

    pack, state = _pack_and_state()
    s04 = heuristic_target_speed(pack, state, target_speed_multiplier=1.0,
                                 fut_sec=2.0, dt=0.4)
    assert np.asarray(s04.loss.target_speed).shape == (pack.num_agents, 5)
    assert s04.loss.dt == 0.4
    s01 = heuristic_target_speed(pack, state, target_speed_multiplier=1.0,
                                 fut_sec=2.0, dt=0.1)
    assert np.asarray(s01.loss.target_speed).shape == (pack.num_agents, 20)


def test_heuristic_target_pos_builder():
    """Plain target_pos (`scene_edit_utils.py:386-394`): same GT waypoint as
    the timed variant, bound to the untimed TargetPosLoss."""
    from cld_tpu.guidance.heuristics import (
        heuristic_target_pos,
        heuristic_target_pos_at_time,
    )
    from cld_tpu.guidance.losses import TargetPosLoss

    pack, state = _pack_and_state()
    spec = heuristic_target_pos(pack, state, target_time=20)
    timed = heuristic_target_pos_at_time(pack, state, target_time=20)
    assert isinstance(spec.loss, TargetPosLoss)
    np.testing.assert_allclose(spec.loss.target_pos, timed.loss.target_pos)
    # the loss evaluates finitely on a plausible trajectory
    ctx = GuidanceContext(
        drivable_map=jnp.ones((pack.num_agents, 32, 32)),
        raster_from_agent=jnp.tile(jnp.eye(3), (pack.num_agents, 1, 1)),
        extent=jnp.ones((pack.num_agents, 3)),
        curr_speed=state.states[:, 2],
        world_from_agent=world_from_agent_matrix(state.states[:, :2], state.states[:, 3]),
        scene_index=pack.scene_index,
    )
    x = jnp.zeros((pack.num_agents, 1, 52, 6))
    val = spec.loss(x, ctx)
    assert np.isfinite(np.asarray(val)).all()


def test_heuristics_from_reference_configs():
    """Reference-format {name, weight, params} configs with the reference's
    param spellings build directly (`compute_heuristic_guidance`,
    `scene_edit_utils.py:806-833`)."""
    from cld_tpu.guidance.heuristics import heuristics_from_configs
    from cld_tpu.guidance.losses import (
        AgentCollisionLoss,
        GlobalTargetPosAtTimeLoss,
        MapCollisionLoss,
        SpeedLimitLoss,
        StopSignLoss,
        TargetSpeedLoss,
    )

    pack, state = _pack_and_state()
    configs = [
        # exactly the reference signatures, incl. host-only knobs
        {"name": "agent_collision", "weight": 10.0,
         "params": {"num_disks": 4, "buffer_dist": 0.3, "decay_rate": 0.8,
                    "excluded_agents": [1]}},
        {"name": "map_collision", "weight": 10.0,
         "params": {"num_points_lw": [6, 6], "decay_rate": 0.9}},
        {"name": "global_target_pos_at_time", "weight": 2.0,
         "params": {"target_time": 15, "urgency": 0.6, "pref_speed": 3.0,
                    "target_tolerance": 2.0, "action_num": 5,
                    "perturb_std": 0.1}},
        {"name": "stop_sign", "weight": 5.0,
         "params": {"target_time": 10, "stop_box_dim": [10.0, 6.0],
                    "scale": 2.0, "horizon_length": 52,
                    "num_time_steps_to_stop": 3, "action_num": 5,
                    "low_speed_th": 0.5}},
        {"name": "speed_limit", "weight": 1.0,
         "params": {"speed_limit_quantile": 0.9, "low_speed_th": 0.3,
                    "fut_sec": 2.0}},
        {"name": "target_speed", "weight": 1.0,
         "params": {"target_speed_multiplier": 1.2, "fut_sec": 2.0}},
        {"name": "target_pos", "weight": 1.0,
         "params": {"target_time": 10, "perturb_std": 0.0}},
        {"name": "dummy_dt_passthrough", "weight": 1.0, "params": {}},
    ]
    import pytest as _pytest

    with _pytest.raises(KeyError):
        heuristics_from_configs(configs, pack, state)
    configs = configs[:-1]
    specs = heuristics_from_configs(configs, pack, state)
    assert len(specs) == 7
    by_type = {type(s.loss).__name__: s for s in specs}
    ac = by_type["AgentCollisionLoss"]
    assert isinstance(ac.loss, AgentCollisionLoss)
    assert ac.loss.num_disks == 4 and ac.loss.decay_rate == 0.8
    # excluded_agents rides on the LOSS (reference guidance_loss.py:447-464):
    # only pairs with BOTH ends excluded are un-penalized — NOT an agent mask
    # (which would kill ALL collision guidance for the excluded agent)
    assert ac.loss.excluded_agents == (1,)
    assert ac.agent_mask is None
    mc = by_type["MapCollisionLoss"]
    assert isinstance(mc.loss, MapCollisionLoss)
    assert mc.loss.num_points_lw == (6, 6)
    gt = by_type["GlobalTargetPosAtTimeLoss"]
    assert isinstance(gt.loss, GlobalTargetPosAtTimeLoss)
    assert gt.loss.pref_speed == 3.0 and gt.weight == 2.0
    ss = by_type["StopSignLoss"]
    assert isinstance(ss.loss, StopSignLoss)
    # stop_box_dim is FULL dims end to end (reference Box convention)
    np.testing.assert_allclose(np.asarray(ss.loss.stop_box_dim)[0], [10.0, 6.0])
    assert ss.loss.scale == 2.0
    sl = by_type["SpeedLimitLoss"]
    assert isinstance(sl.loss, SpeedLimitLoss)
    assert np.isfinite(sl.loss.speed_limit)
    tsp = by_type["TargetSpeedLoss"]
    assert isinstance(tsp.loss, TargetSpeedLoss)
    # reference target_speed is the PER-TIMESTEP GT profile [N, T_fut]
    # (scene_edit_utils.py:571: speed * multiplier), fut_sec=2.0 at dt=0.1
    assert np.asarray(tsp.loss.target_speed).shape == (pack.num_agents, 20)


def test_gpt_pair_heuristics():
    """gptcollision/gptkeepdistance auto-select a (behind, ahead) same-scene
    pair (`scene_edit_utils.py:584-780`)."""
    from cld_tpu.guidance.heuristics import (
        heuristic_gptcollision,
        heuristic_gptkeepdistance,
    )

    pack, state = _pack_and_state(agents=4)
    # craft an unambiguous interacting pair: agents 0 (behind) and 1 (ahead),
    # same heading, 15 m apart, both moving; agents 2/3 stopped
    s = np.zeros((pack.num_agents, 4), np.float32)
    s[0] = [0.0, 0.0, 4.0, 0.0]
    s[1] = [15.0, 0.0, 4.0, 0.0]
    s[2] = [100.0, 100.0, 0.0, 0.0]
    s[3] = [200.0, 200.0, 0.0, 0.0]
    state = state._replace(states=jnp.asarray(s))
    atk = heuristic_gptcollision(pack, state)
    assert atk is not None
    assert atk.loss.attacker_ind == 0 and atk.loss.victim_ind == 1
    kd = heuristic_gptkeepdistance(pack, state, min_distance=4.0,
                                   max_distance=12.0)
    assert kd is not None
    assert kd.loss.target_ind == 0 and kd.loss.ref_ind == 1
    assert kd.loss.min_dist == 4.0 and kd.loss.max_dist == 12.0


def test_rollout_ui_editing_source(tmp_path):
    """--editing-source ui: guidance configs read from a JSON file
    (headless equivalent of reference rollout.py:373 UI edits)."""
    import json
    import types

    from rollout import build_guidance_specs

    pack, sim_cfg_state = _pack_and_state()
    sim_cfg = SimConfig(num_simulation_steps=30, n_step_action=5,
                        raster_size=32, hist_frames=4)
    edits = [{"name": "speed_limit", "weight": 3.0,
              "params": {"speed_limit": 10.0}}]
    f = tmp_path / "ui_edits.json"
    f.write_text(json.dumps(edits))
    args = types.SimpleNamespace(
        guidance="", editing_source="ui", heuristics="", attack_pair=None,
        ui_edits_file=str(f),
    )
    specs = build_guidance_specs(args, pack, sim_cfg, pack.num_agents)
    assert len(specs) == 1 and specs[0].weight == 3.0
    assert specs[0].loss.speed_limit == 10.0
    # file edited between invocations -> fresh specs
    edits[0]["params"]["speed_limit"] = 7.0
    f.write_text(json.dumps(edits))
    specs = build_guidance_specs(args, pack, sim_cfg, pack.num_agents)
    assert specs[0].loss.speed_limit == 7.0
    # missing file is a hard error, not silence
    args.ui_edits_file = None
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        build_guidance_specs(args, pack, sim_cfg, pack.num_agents)


def test_heuristics_file_arg(tmp_path):
    """--heuristics @file.json: reference-format heuristic configs."""
    import json
    import types

    from rollout import build_guidance_specs

    pack, _ = _pack_and_state()
    sim_cfg = SimConfig(num_simulation_steps=30, n_step_action=5,
                        raster_size=32, hist_frames=4)
    cfgs = [{"name": "map_collision", "weight": 4.0,
             "params": {"num_points_lw": [8, 8], "decay_rate": 0.9}}]
    f = tmp_path / "heur.json"
    f.write_text(json.dumps(cfgs))
    args = types.SimpleNamespace(
        guidance="", editing_source="heuristic", heuristics=f"@{f}",
        attack_pair=None, ui_edits_file=None,
    )
    specs = build_guidance_specs(args, pack, sim_cfg, pack.num_agents)
    assert len(specs) == 1 and specs[0].weight == 4.0
    assert specs[0].loss.num_points_lw == (8, 8)
