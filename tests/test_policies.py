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
