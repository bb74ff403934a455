"""Unicycle vehicle dynamics — the leaf math layer.

Capability parity with the reference's dynamics stack
(`/root/reference/src/tbsim/dynamics/unicycle.py:7-187` and the parallel
integrator `src/tbsim/models/diffuser_helpers.py:541-672`), designed
TPU-first:

* the reference integrates action sequences with two `[T+1, T+1]`
  lower-triangular mat-muls ("parallel" mode); here the same semantics are a
  pair of `jnp.cumsum`s — O(T) memory traffic instead of O(T^2) FLOPs, and
  XLA fuses the whole integrator into one kernel;
* bounds that the reference computes under `torch.no_grad()` are wrapped in
  `jax.lax.stop_gradient` so the custom clipping semantics (and their
  gradients) match exactly;
* everything is shape-polymorphic over leading batch dims `[..., T, 2]` so
  the same function serves agent-centric `[B, T, 2]` and scene-centric
  `[B, A, T, 2]` inputs.

State convention: ``x = (pos_x, pos_y, vel, yaw)``; action ``u = (acc, yawvel)``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class UnicycleParams(NamedTuple):
    """Unicycle bounds. Defaults mirror the reference's constructor defaults
    (`unicycle.py:8-9`): the project config only overrides max_steer,
    max_yawvel and acce_bound, so vbound stays at (-10, 30)."""

    max_steer: float = 0.5
    max_yawvel: float = 8.0
    acce_lo: float = -6.0
    acce_hi: float = 4.0
    v_lo: float = -10.0
    v_hi: float = 30.0

    @classmethod
    def from_config(cls, dyn_cfg) -> "UnicycleParams":
        return cls(
            max_steer=float(dyn_cfg["max_steer"]),
            max_yawvel=float(dyn_cfg["max_yawvel"]),
            acce_lo=float(dyn_cfg["acce_bound"][0]),
            acce_hi=float(dyn_cfg["acce_bound"][1]),
        )


def unicycle_ubound(params: UnicycleParams, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Speed-dependent action bounds (lb, ub) for state x[..., 4].

    Mirrors `unicycle.py:89-129` (torch branch): the yaw-rate bound is
    min(max_steer*|v|, max_yawvel/max(|v|,0.1)) floored at 0.1, and the
    acceleration bound keeps velocity inside vbound while staying inside
    acce_bound.
    """
    v = x[..., 2:3]
    av = jnp.abs(v)
    yawbound = jnp.minimum(params.max_steer * av, params.max_yawvel / jnp.clip(av, min=0.1))
    yawbound = jnp.clip(yawbound, min=0.1)
    acce_lb = jnp.clip(jnp.clip(params.v_lo - v, max=params.acce_hi), min=params.acce_lo)
    acce_ub = jnp.clip(jnp.clip(params.v_hi - v, min=params.acce_lo), max=params.acce_hi)
    lb = jnp.concatenate([acce_lb, -yawbound], axis=-1)
    ub = jnp.concatenate([acce_ub, yawbound], axis=-1)
    return lb, ub


def unicycle_step(
    params: UnicycleParams, x: jnp.ndarray, u: jnp.ndarray, dt: float, bound: bool = True
) -> jnp.ndarray:
    """Single midpoint-integration step (`unicycle.py:41-87`)."""
    if bound:
        lb, ub = unicycle_ubound(params, x)
        lb = jax.lax.stop_gradient(lb)
        ub = jax.lax.stop_gradient(ub)
        u = jnp.clip(u, lb, ub)
    theta = x[..., 3:4]
    v_mid = x[..., 2:3] + u[..., 0:1] * dt * 0.5
    dxdt = jnp.concatenate([jnp.cos(theta) * v_mid, jnp.sin(theta) * v_mid, u], axis=-1)
    return x + dxdt * dt


def unicycle_forward_dynamics(
    params: UnicycleParams,
    initial_states: jnp.ndarray,
    actions: jnp.ndarray,
    dt: float,
) -> jnp.ndarray:
    """Integrate an action sequence into a state trajectory.

    Semantics of the reference's fastest path, 'parallel' mode
    (`diffuser_helpers.py:541-672`), re-expressed with cumulative sums:

      * acceleration is clipped to acce_bound, integrated, and the whole
        velocity profile (including v0) is clipped to vbound *after* the
        cumulative sum — this is what makes 'parallel' differ from 'chain'
        when velocity saturates, and we reproduce it bit-for-bit;
      * position uses the midpoint velocity 0.5*(v[t]+v[t+1]) rotated by the
        *previous* yaw;
      * the yaw-rate bound is computed from the clipped velocity at the
        earlier step, under stop_gradient (reference: `torch.no_grad()`).

    Args:
        initial_states: [..., 4]   (x, y, v, yaw)
        actions:        [..., T, 2] (acc, yawvel)
    Returns:
        states [..., T, 4]
    """
    acc = actions[..., 0]
    yawvel = actions[..., 1]

    acc_clipped = jnp.clip(acc, params.acce_lo, params.acce_hi)
    v0 = initial_states[..., 2:3]
    v_cum = v0 + jnp.cumsum(acc_clipped * dt, axis=-1)
    v_full = jnp.concatenate([v0, v_cum], axis=-1)  # [..., T+1]
    v_clipped = jnp.clip(v_full, params.v_lo, params.v_hi)
    v_avg = 0.5 * (v_clipped[..., :-1] + v_clipped[..., 1:])  # midpoint velocity
    v = v_clipped[..., 1:]
    v_earlier = v_clipped[..., :-1]

    av = jnp.abs(v_earlier)
    yawbound = jnp.minimum(params.max_steer * av, params.max_yawvel / jnp.clip(av, min=0.1))
    yawbound = jax.lax.stop_gradient(jnp.clip(yawbound, min=0.1))
    yawvel_clipped = jnp.clip(yawvel, -yawbound, yawbound)

    yaw0 = initial_states[..., 3:4]
    yaw_cum = yaw0 + jnp.cumsum(yawvel_clipped * dt, axis=-1)
    yaw_full = jnp.concatenate([yaw0, yaw_cum], axis=-1)  # [..., T+1]
    yaw = yaw_full[..., 1:]
    yaw_earlier = yaw_full[..., :-1]

    vx = v_avg * jnp.cos(yaw_earlier)
    vy = v_avg * jnp.sin(yaw_earlier)
    x = initial_states[..., 0:1] + jnp.cumsum(vx * dt, axis=-1)
    y = initial_states[..., 1:2] + jnp.cumsum(vy * dt, axis=-1)

    return jnp.stack([x, y, v, yaw], axis=-1)


def unicycle_forward_dynamics_chain(
    params: UnicycleParams,
    initial_states: jnp.ndarray,
    actions: jnp.ndarray,
    dt: float,
) -> jnp.ndarray:
    """'chain' mode of the reference (`diffuser_helpers.py:645-672`): a strict
    per-step midpoint rollout with per-step bounds — as a lax.scan over T.

    Kept for closed-loop stepping and as a semantics cross-check against the
    parallel integrator in tests.
    """
    t_axis = actions.ndim - 2
    actions_tfirst = jnp.moveaxis(actions, t_axis, 0)

    def body(x, u):
        x_next = unicycle_step(params, x, u, dt, bound=True)
        return x_next, x_next

    _, xs = jax.lax.scan(body, initial_states, actions_tfirst)
    return jnp.moveaxis(xs, 0, t_axis)


def unicycle_inverse_dyn(x: jnp.ndarray, xp: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Recover actions from consecutive states (`unicycle.py:186-187`)."""
    return (xp[..., 2:] - x[..., 2:]) / dt


def unicycle_calculate_vel(
    pos: jnp.ndarray, yaw: jnp.ndarray, dt: float, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked finite-difference longitudinal velocity (`unicycle.py:140-184`).

    pos [..., T, 2], yaw [..., T, 1], mask [..., T] (bool) -> vel [..., T, 1].
    """
    vel = (pos[..., 1:, 0:1] - pos[..., :-1, 0:1]) / dt * jnp.cos(yaw[..., 1:, :]) + (
        pos[..., 1:, 1:2] - pos[..., :-1, 1:2]
    ) / dt * jnp.sin(yaw[..., 1:, :])
    vel_r = jnp.concatenate([vel[..., 0:1, :], vel], axis=-2)
    vel_l = jnp.concatenate([vel, vel[..., -1:, :]], axis=-2)

    mask_r = jnp.roll(mask, 1, axis=-1).at[..., 0].set(False) & mask
    mask_l = jnp.roll(mask, -1, axis=-1).at[..., -1].set(False) & mask

    both = (mask_l & mask_r)[..., None]
    only_l = (mask_l & ~mask_r)[..., None]
    only_r = (mask_r & ~mask_l)[..., None]
    return both * (vel_r + vel_l) / 2 + only_l * vel_l + only_r * vel_r


def angle_diff(theta1: jnp.ndarray, theta2: jnp.ndarray) -> jnp.ndarray:
    """Smallest signed angle difference (`diffuser_helpers.py:674-683`)."""
    period = 2 * np.pi
    diff = jnp.mod(theta1 - theta2 + period / 2, period) - period / 2
    return jnp.where(diff > np.pi, diff - 2 * np.pi, diff)


def convert_state_to_state_and_action(
    traj_state: jnp.ndarray, vel_init: jnp.ndarray, dt: float
) -> jnp.ndarray:
    """Infer (vel, acc, yawvel) from a GT (x, y, yaw) trajectory via inverse
    unicycle dynamics (`diffuser_helpers.py:685-749`).

    The current pose is the agent-frame origin, so the trajectory is
    pre-padded with zero pos/yaw before finite differencing.

    Args:
        traj_state: [..., T, 3] (x, y, yaw) in agent frame
        vel_init:   [...]       current speed
    Returns:
        [..., T, 6]  (x, y, vel, yaw, acc, yawvel)
    """
    bm = traj_state.shape[:-2]
    pos_init = jnp.zeros((*bm, 1, 2), dtype=traj_state.dtype)
    yaw_init = jnp.zeros((*bm, 1, 1), dtype=traj_state.dtype)

    target_pos = traj_state[..., :2]
    traj_yaw = traj_state[..., 2:]

    pos = jnp.concatenate([pos_init, target_pos], axis=-2)  # [..., T+1, 2]
    yaw = jnp.concatenate([yaw_init, traj_yaw], axis=-2)

    vel_init = vel_init[..., None, None]
    vel = (pos[..., 1:, 0:1] - pos[..., :-1, 0:1]) / dt * jnp.cos(yaw[..., 1:, :]) + (
        pos[..., 1:, 1:2] - pos[..., :-1, 1:2]
    ) / dt * jnp.sin(yaw[..., 1:, :])
    vel = jnp.concatenate([vel_init.astype(vel.dtype), vel], axis=-2)  # [..., T+1, 1]

    acc = (vel[..., 1:, :] - vel[..., :-1, :]) / dt
    yawvel = angle_diff(yaw[..., 1:, :], yaw[..., :-1, :]) / dt

    pos, yaw, vel = pos[..., 1:, :], yaw[..., 1:, :], vel[..., 1:, :]
    return jnp.concatenate([pos, vel, yaw, acc, yawvel], axis=-1)
