"""Kinematic lattice planner — the optimization/planning policy family.

Capability parity with the reference's planner stack: the spline-planner
tree policies (`/root/reference/src/tbsim/utils/planning_utils.py:11`, built
on the external Pplan spline sampler), the hardcoded MPC
(`policies/hardcoded.py:666` + the FTOCP solver `utils/ftocp.py:6`), and the
contingency planner (`policies/hardcoded.py:286`). TPU-native re-design:
instead of a host-side QP/spline solver, generate a static lattice of
kinematically-feasible unicycle candidates (cross product of target speeds x
yaw-rate profiles), roll them all out in one batched `unicycle_forward_dynamics`,
score them with vectorized costs (offroad, collision, progress, comfort),
and pick the argmin — the whole plan-evaluate-select pipeline is a handful
of fused tensor ops inside the rollout scan.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.algos.reward import drivable_values_at
from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics
from cld_tpu.policies.common import Action


@dataclasses.dataclass(frozen=True)
class LatticePlannerConfig:
    horizon: int = 52
    dt: float = 0.1
    target_speeds: Tuple[float, ...] = (0.0, 2.0, 5.0, 8.0, 12.0)
    yawvels: Tuple[float, ...] = (-0.3, -0.15, 0.0, 0.15, 0.3)
    speed_gain: float = 1.0  # P-controller toward the target speed
    w_offroad: float = 10.0
    w_collision: float = 100.0  # dominates: collision is a hard constraint
    w_progress: float = 1.0
    w_comfort: float = 0.1
    collision_thresh: float = 2.5
    dyn: UnicycleParams = UnicycleParams(
        max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0, acce_hi=8.0
    )


def lattice_planner_policy(cfg: LatticePlannerConfig = LatticePlannerConfig()):
    """Build the policy `(obs, rng) -> Action` evaluating the full lattice."""
    K = len(cfg.target_speeds) * len(cfg.yawvels)
    tgt_speeds, yawvels = map(
        jnp.asarray,
        zip(*[(s, w) for s in cfg.target_speeds for w in cfg.yawvels]),
    )

    def policy(obs: TrafficBatch, rng) -> Action:
        B = obs.curr_speed.shape[0]
        T = cfg.horizon
        curr = get_current_states(obs)  # [B, 4]

        # candidate accelerations [B, K, T]: the P-controller toward the
        # target speed is rolled forward over the horizon (1-D speed scan),
        # so a 'stop' candidate actually stops instead of holding the t=0
        # deceleration and reversing
        v0 = jnp.broadcast_to(curr[:, 2][:, None], (B, K))

        def speed_step(v, _):
            a = jnp.clip(
                cfg.speed_gain * (tgt_speeds[None] - v), cfg.dyn.acce_lo, cfg.dyn.acce_hi
            )
            v_next = jnp.clip(v + a * cfg.dt, cfg.dyn.v_lo, cfg.dyn.v_hi)
            return v_next, a

        _, acc_profile = jax.lax.scan(speed_step, v0, None, length=T)  # [T, B, K]
        acc = acc_profile.transpose(1, 2, 0)  # [B, K, T]
        # lateral candidates are lane nudges, not circles: yaw-rate applied
        # for the first quarter of the horizon, then counter-steered back to
        # the original heading over the second quarter
        q = T // 4
        yaw_profile = jnp.concatenate(
            [jnp.ones((q,)), -jnp.ones((q,)), jnp.zeros((T - 2 * q,))]
        )  # net heading change ~0
        actions = jnp.stack(
            [
                acc,
                jnp.broadcast_to(
                    yawvels[None, :, None] * yaw_profile[None, None, :], (B, K, T)
                ),
            ],
            axis=-1,
        )

        # batch-rollout all candidates
        curr_rep = jnp.repeat(curr, K, axis=0)
        states = unicycle_forward_dynamics(
            cfg.dyn, curr_rep, actions.reshape(B * K, T, 2), cfg.dt
        ).reshape(B, K, T, 4)

        # costs
        pos = states[..., :2]
        offroad = 1.0 - drivable_values_at(pos, obs.drivable_map, obs.raster_from_agent)
        # points beyond the raster clamp to the border pixel in
        # drivable_values_at (reference reward semantics); for PLANNING that
        # would leave the planner blind past the map edge — fast candidates
        # overrun a 64 px viewport within the horizon — so out-of-raster
        # points count as offroad
        from cld_tpu.ops.geometry import transform_points as _tp

        pr = _tp(pos, obs.raster_from_agent)
        H, W = obs.drivable_map.shape[-2:]
        inside = (
            (pr[..., 0] >= 0) & (pr[..., 0] <= W - 1)
            & (pr[..., 1] >= 0) & (pr[..., 1] <= H - 1)
        )
        offroad = jnp.where(inside, offroad, 1.0)
        c_offroad = jnp.mean(offroad, axis=-1)  # [B, K]

        other = obs.all_other_agents_future_positions  # [B, S, T', 2]
        avail = obs.all_other_agents_future_availability > 0
        Tm = min(T, other.shape[2])
        d = jnp.linalg.norm(
            pos[:, :, None, :Tm] - other[:, None, :, :Tm], axis=-1
        )  # [B, K, S, Tm]
        hits = (d < cfg.collision_thresh) & avail[:, None, :, :Tm]
        # any-hit indicator: a colliding candidate is (near-)inadmissible
        c_coll = jnp.any(hits, axis=(2, 3)).astype(jnp.float32)

        # forward progress normalized to average speed so its scale is
        # bounded by max_speed and cannot outvote the collision penalty
        progress = (states[..., -1, 0] - states[..., 0, 0]) / (T * cfg.dt)
        c_comfort = jnp.mean(jnp.abs(actions[..., 0]), axis=-1) + jnp.mean(
            jnp.abs(actions[..., 1]), axis=-1
        )

        cost = (
            cfg.w_offroad * c_offroad
            + cfg.w_collision * c_coll
            - cfg.w_progress * progress
            + cfg.w_comfort * c_comfort
        )  # [B, K]
        best = jnp.argmin(cost, axis=-1)  # [B]
        sel = lambda arr: jnp.take_along_axis(
            arr, best.reshape((B, 1) + (1,) * (arr.ndim - 2)), axis=1
        )[:, 0]
        return Action(
            positions=sel(pos),
            yaws=sel(states[..., 3:4]),
            controls=sel(actions),
        )

    return policy
