"""Additional vehicle dynamics models: Bicycle, Single/Double integrator.

Capability parity with the reference's dynamics family beyond the unicycle
(`/root/reference/src/tbsim/dynamics/bicycle.py:7-151`,
`single_integrator.py:7-60`, `double_integrator.py:8-90`). Pure jnp, shape
polymorphic over leading batch dims, bounds under stop_gradient like the
torch versions' detached clips.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class BicycleParams(NamedTuple):
    """Bicycle bounds (`bicycle.py:42-67`). State [.., 6] =
    (x, y, h, speed, hdot, veh_length); action (acc, ddh)."""

    acc_lo: float = -10.0
    acc_hi: float = 8.0
    ddh_lo: float = -2 * math.pi
    ddh_hi: float = 2 * math.pi
    max_speed: float = 50.0
    max_hdot: float = 2 * math.pi


def bicycle_step(
    params: BicycleParams, x: jnp.ndarray, u: jnp.ndarray, dt: float,
    normalize: bool = True,
) -> jnp.ndarray:
    """No-reverse differentiable bicycle step (`bicycle.py:7-37,88-116`).

    normalize=True maps raw network outputs through a sigmoid onto the
    control bounds (the reference's get_normalized_controls); False clips.
    """
    if normalize:
        s = jax.nn.sigmoid(u)
        acc = params.acc_lo + (params.acc_hi - params.acc_lo) * s[..., 0]
        ddh = params.ddh_lo + (params.ddh_hi - params.ddh_lo) * s[..., 1]
    else:
        acc = jnp.clip(u[..., 0], params.acc_lo, params.acc_hi)
        ddh = jnp.clip(u[..., 1], params.ddh_lo, params.ddh_hi)

    veh_len = x[..., 5]
    new_hdot = jnp.clip(x[..., 4] + ddh * dt, -params.max_hdot, params.max_hdot)
    new_h = x[..., 2] + dt * jnp.abs(x[..., 3]) / veh_len * new_hdot
    new_s = jnp.clip(x[..., 3] + acc * dt, 0.0, params.max_speed)  # no reverse
    new_x = x[..., 0] + new_s * jnp.cos(new_h) * dt
    new_y = x[..., 1] + new_s * jnp.sin(new_h) * dt
    return jnp.stack([new_x, new_y, new_h, new_s, new_hdot, veh_len], axis=-1)


def bicycle_state2pos(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., :2]


def bicycle_state2yaw(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 2:3]


class SingleIntegratorParams(NamedTuple):
    """Velocity bounds per dim: [D, 2] (`single_integrator.py:7-16`)."""

    vbound: Tuple[Tuple[float, float], ...] = ((-30.0, 30.0), (-30.0, 30.0))


def single_integrator_step(
    params: SingleIntegratorParams, x: jnp.ndarray, u: jnp.ndarray, dt: float,
    bound: bool = True,
) -> jnp.ndarray:
    """x' = x + u*dt with per-dim velocity clipping
    (`single_integrator.py:21-31`)."""
    vb = jnp.asarray(params.vbound)
    if bound:
        u = jnp.clip(u, vb[:, 0], vb[:, 1])
    return x + u * dt


class DoubleIntegratorParams(NamedTuple):
    """Acceleration (+ optional velocity) bounds per dim
    (`double_integrator.py:8-17`)."""

    abound: Tuple[Tuple[float, float], ...] = ((-8.0, 8.0), (-8.0, 8.0))
    vbound: Tuple[Tuple[float, float], ...] | None = None


def double_integrator_step(
    params: DoubleIntegratorParams, x: jnp.ndarray, u: jnp.ndarray, dt: float,
    bound: bool = True,
) -> jnp.ndarray:
    """State [.., 4] = (px, py, vx, vy); midpoint position update
    (`double_integrator.py:28-45`). With vbound set, accelerations that
    would exceed the velocity bound are zeroed (the reference's gated
    bounds, `double_integrator.py:53-90`)."""
    ab = jnp.asarray(params.abound)
    if bound:
        if params.vbound is None:
            lb, ub = ab[:, 0], ab[:, 1]
        else:
            vb = jnp.asarray(params.vbound)
            lb = (x[..., 2:] > vb[:, 0]) * ab[:, 0]
            ub = (x[..., 2:] < vb[:, 1]) * ab[:, 1]
        u = jnp.clip(u, lb, ub)
    pos = x[..., 0:2] + (x[..., 2:4] + 0.5 * u * dt) * dt
    vel = x[..., 2:4] + u * dt
    return jnp.concatenate([pos, vel], axis=-1)
