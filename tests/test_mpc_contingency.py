"""FTOCP-family MPC + contingency tree planner (VERDICT missing #8;
ref ftocp.py:6-160, planning_utils.py:128-385, hardcoded.py:286,666)."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.policies.contingency import (
    ContingencyConfig,
    build_ego_tree,
    collision_cost,
    contingency_plan,
    contingency_policy,
    ego_sample_planning,
)
from cld_tpu.policies.mpc import MPCConfig, ftocp_solve, lane_ref, mpc_policy


def _no_obstacles(Nobs=2, M=1, N=20):
    return (
        jnp.full((Nobs, M, N, 2), 1e3),
        jnp.zeros((Nobs,), bool),
        jnp.broadcast_to(jnp.array([4.5, 2.0]), (Nobs, 2)),
    )


def test_ftocp_tracks_straight_reference():
    cfg = MPCConfig(N=20, iters=150, lr=0.3)
    x0 = jnp.array([0.0, 0.0, 5.0, 0.0])
    t = jnp.arange(1, 21) * cfg.dt
    xdes = jnp.stack([5.0 * t, jnp.zeros_like(t), jnp.full_like(t, 5.0)], axis=-1)
    yp, mask, ext = _no_obstacles(N=cfg.N)
    out = jax.jit(lambda: ftocp_solve(
        cfg, x0, yp, mask, ext, jnp.array([4.5, 2.0]), xdes, jnp.ones(1)
    ))()
    xs = np.asarray(out["xbr"][0])
    assert bool(out["feasible"])
    # constant-speed straight line is exactly reachable: tight tracking
    np.testing.assert_allclose(xs[:, 0], np.asarray(xdes[:, 0]), atol=0.3)
    np.testing.assert_allclose(xs[:, 1], 0.0, atol=0.1)


def test_ftocp_avoids_obstacle_near_path():
    """A laterally-offset obstacle near the reference path: the solver must
    trade the 1e6-cost ellipse slack against tracking and swerve/brake clear
    (the FTOCP objective structure, ftocp.py:96-121)."""
    cfg = MPCConfig(N=20, iters=300, lr=0.3)
    x0 = jnp.array([0.0, 0.0, 5.0, 0.0])
    t = jnp.arange(1, 21) * cfg.dt
    xdes = jnp.stack([5.0 * t, jnp.zeros_like(t), jnp.full_like(t, 5.0)], axis=-1)
    yp = jnp.broadcast_to(jnp.array([8.0, 1.0]), (1, 1, cfg.N, 2))
    mask = jnp.ones((1,), bool)
    ext = jnp.array([[4.5, 2.0]])
    out = ftocp_solve(cfg, x0, yp, mask, ext, jnp.array([4.5, 2.0]), xdes, jnp.ones(1))
    xs = np.asarray(out["xbr"][0])
    # pure tracking would end deep inside the keep-out ellipse; the plan
    # keeps the worst per-step slack small instead
    assert float(out["max_violation"]) < 0.15
    # and it veers away from the obstacle (negative y) and/or brakes
    assert xs[-1, 1] < -0.2 or xs[-1, 0] < 6.0


def test_ftocp_contingency_branches_share_first_control():
    cfg = MPCConfig(N=10, M=2, iters=50)
    x0 = jnp.array([0.0, 0.0, 5.0, 0.0])
    t = jnp.arange(1, 11) * cfg.dt
    xdes = jnp.stack([5.0 * t, jnp.zeros_like(t), jnp.full_like(t, 5.0)], axis=-1)
    yp, mask, ext = _no_obstacles(M=2, N=10)
    out = ftocp_solve(cfg, x0, yp, mask, ext, jnp.array([4.5, 2.0]), xdes,
                      jnp.array([0.5, 0.5]))
    assert out["xbr"].shape == (2, 10, 4)
    # both branches start from the same first state (shared u0)
    np.testing.assert_allclose(
        np.asarray(out["xbr"][0, 0]), np.asarray(out["xbr"][1, 0]), atol=1e-6
    )


def test_lane_ref_follows_lane():
    L = 32
    lane = np.zeros((L, 3), np.float32)
    lane[:, 0] = np.linspace(-10, 50, L)
    lane[:, 1] = 2.0
    ref, usable = lane_ref(jnp.asarray(lane), jnp.ones(L, bool),
                           jnp.zeros(2), jnp.asarray(5.0), N=10, dt=0.1)
    ref = np.asarray(ref)
    assert bool(usable)
    assert ref.shape == (10, 3)
    np.testing.assert_allclose(ref[:, 1], 2.0, atol=0.3)  # on the lane
    assert (np.diff(ref[:, 0]) > 0).all()  # moving forward along it
    np.testing.assert_allclose(ref[:, 2], 5.0)
    # NaN padding in masked rows must not poison the soft assignment
    lane_nan = lane.copy()
    lane_nan[L // 2:] = np.nan
    avail = np.zeros(L, bool)
    avail[: L // 2] = True
    ref2, usable2 = lane_ref(jnp.asarray(lane_nan), jnp.asarray(avail),
                             jnp.zeros(2), jnp.asarray(5.0), N=10, dt=0.1)
    assert bool(usable2)
    assert np.isfinite(np.asarray(ref2)).all()
    # no available lane points at all (e.g. agent beyond max_dist of every
    # centerline) -> usable=False and the caller falls back to the straight
    # reference instead of averaging zero-filled padding toward the origin
    _, usable3 = lane_ref(jnp.asarray(lane), jnp.zeros(L, bool),
                          jnp.zeros(2), jnp.asarray(5.0), N=10, dt=0.1)
    assert not bool(usable3)


def test_mpc_policy_runs_on_batch():
    batch = synthetic_batch(seed=0, batch_size=3, raster_size=64)
    policy = mpc_policy(MPCConfig(N=10, iters=30))
    act = jax.jit(lambda o: policy(o, jax.random.key(0)))(batch)
    assert act.positions.shape == (3, 10, 2)
    assert act.controls.shape == (3, 10, 2)
    assert bool(jnp.isfinite(act.positions).all())


def test_ego_sample_planning_prefers_collision_free():
    B, K, T = 1, 2, 10
    ego = np.zeros((B, K, T, 3), np.float32)
    ego[0, 0, :, 0] = np.linspace(1, 10, T)  # straight into the obstacle
    ego[0, 1, :, 0] = np.linspace(1, 10, T)
    ego[0, 1, :, 1] = 6.0  # shifted one lane over
    agent = np.zeros((B, 1, T, 2), np.float32)
    agent[0, 0, :, 0] = 5.0
    idx = ego_sample_planning(
        jnp.asarray(ego), jnp.asarray(agent),
        jnp.array([[4.5, 2.0]]), jnp.array([[[4.5, 2.0]]]), jnp.ones((B, 1)),
        jnp.ones((B, 32, 32)), jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        weights={"collision_weight": 10.0, "lane_weight": 1.0},
    )
    assert int(idx[0]) == 1


def test_contingency_plan_picks_safe_branch():
    cfg = ContingencyConfig(stages=2, frames_per_stage=5,
                            target_speeds=(0.0, 5.0), yawvels=(-0.3, 0.0, 0.3),
                            num_modes=2)
    curr = jnp.array([0.0, 0.0, 5.0, 0.0])
    ego = build_ego_tree(cfg, curr)
    K, S = cfg.K, cfg.stages
    assert ego.shape == (K**S, cfg.horizon, 4)

    # one obstacle parked ahead in every scenario mode, far enough that
    # braking keeps clear of the 4.5 m combined disk radius
    T = cfg.horizon
    Mtot = cfg.num_modes**S
    agent = jnp.broadcast_to(jnp.array([12.0, 0.0]), (Mtot, 1, T, 2))
    out = contingency_plan(
        cfg, ego, agent, jnp.full((Mtot,), 1.0 / Mtot), jnp.ones((1,)),
        jnp.array([4.5, 2.0]), jnp.array([[4.5, 2.0]]),
        jnp.ones((64, 64)), jnp.eye(3),
    )
    plan = np.asarray(out["plan"])
    # straight at 5 m/s would pass within ~7 m of the obstacle; the chosen
    # plan (braking branch) stays clear of the combined radius
    d = np.linalg.norm(plan[:, :2] - np.array([12.0, 0.0]), axis=-1)
    assert d.min() > 4.5
    assert out["root_cost"].shape == (K,)


def test_contingency_policy_runs_on_batch():
    batch = synthetic_batch(seed=1, batch_size=2, raster_size=64)
    cfg = ContingencyConfig(stages=2, frames_per_stage=5,
                            target_speeds=(0.0, 5.0), yawvels=(0.0,),
                            num_modes=2)
    policy = contingency_policy(cfg)
    act = jax.jit(lambda o: policy(o, jax.random.key(0)))(batch)
    assert act.positions.shape == (2, cfg.horizon, 2)
    assert bool(jnp.isfinite(act.controls).all())
