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


_BIG = 1e6


def always(robustness: jnp.ndarray, temp: float = 10.0,
           interval=None) -> jnp.ndarray:
    """G(phi): min over time of the per-step robustness.

    Unbounded ([.., T] -> [..]) when `interval` is None. With
    `interval=(a, b)` (inclusive offsets, `stlcg.Always(interval=[a, b])`)
    the output keeps the time axis: out[t] = min over tau in
    [t+a, min(t+b, T-1)] — windows truncate at the trace end, matching
    stlcg's recurrent cells initialized with +LARGE."""
    if interval is None:
        return _softmin(robustness, axis=-1, temp=temp)
    a, b = interval
    T = robustness.shape[-1]
    pad = jnp.full(robustness.shape[:-1] + (b,), _BIG, robustness.dtype)
    r = jnp.concatenate([robustness, pad], axis=-1)
    win = jnp.stack([r[..., i : T + i] for i in range(a, b + 1)], axis=-1)
    return _softmin(win, axis=-1, temp=temp)


def eventually(robustness: jnp.ndarray, temp: float = 10.0,
               interval=None) -> jnp.ndarray:
    """F(phi): max over time (see `always` for interval semantics)."""
    if interval is None:
        return _softmax(robustness, axis=-1, temp=temp)
    a, b = interval
    T = robustness.shape[-1]
    pad = jnp.full(robustness.shape[:-1] + (b,), -_BIG, robustness.dtype)
    r = jnp.concatenate([robustness, pad], axis=-1)
    win = jnp.stack([r[..., i : T + i] for i in range(a, b + 1)], axis=-1)
    return _softmax(win, axis=-1, temp=temp)


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
    """F(G_[0,k](inside_region AND speed <= stop_speed)): the vehicle must
    eventually hold a (near-)stop for `num_steps_to_stop`+1 consecutive
    frames inside the stop region (`stl_traffic_rules.py:108-110`,
    `Eventually(Always(in_stop_box & low_speed, interval=[0, k]))` — the
    stop core of the reference formula; the full
    `Always(Implies(...)) | (out & middle_speed)` form lives in
    `cld_tpu.guidance.losses._stop_sign_robustness`)."""

    box_center: tuple = (15.0, 0.0)
    box_half: tuple = (5.0, 3.0)
    stop_speed: float = 0.5
    num_steps_to_stop: int = 0
    temp: float = 10.0

    def robustness(self, traj: jnp.ndarray) -> jnp.ndarray:
        center = jnp.asarray(self.box_center)
        half = jnp.asarray(self.box_half)
        # inside-region robustness: min over the two axis margins
        margins = half - jnp.abs(traj[..., :2] - center)  # [.., T, 2]
        inside = _softmin(margins, axis=-1, temp=self.temp)  # [.., T]
        slow = self.stop_speed - jnp.abs(traj[..., 2])  # [.., T]
        both = stl_and(inside, slow, temp=self.temp)
        held = always(both, temp=self.temp,
                      interval=(0, self.num_steps_to_stop))
        return eventually(held, temp=self.temp)

    def loss(self, traj: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.relu(-self.robustness(traj))
