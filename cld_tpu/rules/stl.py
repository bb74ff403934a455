"""Differentiable Signal Temporal Logic robustness for traffic rules.

Capability parity with `/root/reference/rules/stl_traffic_rules.py:7-340`
(stop-sign and speed-limit rules expressed through the external `stlcg`
library). Re-implemented natively: robustness semantics over [B, T] signals
with soft (log-sum-exp) min/max so the robustness is differentiable and can
feed the guidance engine (higher robustness = more satisfied; use negative
robustness as a guidance loss).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _softmin(x: jnp.ndarray, axis=-1, temp: float = 10.0) -> jnp.ndarray:
    return -jax.nn.logsumexp(-temp * x, axis=axis) / temp


def _softmax(x: jnp.ndarray, axis=-1, temp: float = 10.0) -> jnp.ndarray:
    return jax.nn.logsumexp(temp * x, axis=axis) / temp


def always(robustness: jnp.ndarray, temp: float = 10.0) -> jnp.ndarray:
    """G(phi): min over time of the per-step robustness [.., T] -> [..]."""
    return _softmin(robustness, axis=-1, temp=temp)


def eventually(robustness: jnp.ndarray, temp: float = 10.0) -> jnp.ndarray:
    """F(phi): max over time."""
    return _softmax(robustness, axis=-1, temp=temp)


def stl_and(*rs, temp: float = 10.0) -> jnp.ndarray:
    return _softmin(jnp.stack(rs, axis=-1), axis=-1, temp=temp)


def stl_or(*rs, temp: float = 10.0) -> jnp.ndarray:
    return _softmax(jnp.stack(rs, axis=-1), axis=-1, temp=temp)


@dataclasses.dataclass(frozen=True)
class SpeedLimitRule:
    """G(speed <= limit): robustness = min_t (limit - |v_t|)
    (`stl_traffic_rules.py` speed rule)."""

    speed_limit: float = 15.0
    temp: float = 10.0

    def robustness(self, traj: jnp.ndarray) -> jnp.ndarray:
        """traj [.., T, 6] -> [..]; positive iff the rule holds."""
        return always(self.speed_limit - jnp.abs(traj[..., 2]), temp=self.temp)

    def loss(self, traj: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.relu(-self.robustness(traj))


@dataclasses.dataclass(frozen=True)
class StopSignRule:
    """F(inside_region AND speed <= stop_speed): the vehicle must eventually
    be (nearly) stopped inside the stop region
    (`stl_traffic_rules.py` stop-sign rule)."""

    box_center: tuple = (15.0, 0.0)
    box_half: tuple = (5.0, 3.0)
    stop_speed: float = 0.5
    temp: float = 10.0

    def robustness(self, traj: jnp.ndarray) -> jnp.ndarray:
        center = jnp.asarray(self.box_center)
        half = jnp.asarray(self.box_half)
        # inside-region robustness: min over the two axis margins
        margins = half - jnp.abs(traj[..., :2] - center)  # [.., T, 2]
        inside = _softmin(margins, axis=-1, temp=self.temp)  # [.., T]
        slow = self.stop_speed - jnp.abs(traj[..., 2])  # [.., T]
        both = stl_and(inside, slow, temp=self.temp)
        return eventually(both, temp=self.temp)

    def loss(self, traj: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.relu(-self.robustness(traj))
