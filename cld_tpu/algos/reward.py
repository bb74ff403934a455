"""PPO reward and failure-rate kernels.

Capability parity with `/root/reference/models/rl/criticmodel.py:7-145`:

* offroad: -1 per timestep whose rasterized position lands off the drivable
  map (integer gather, clamped to the raster);
* collision: -1 per (neighbor, timestep) whose future position comes within
  0.8 m of the sampled trajectory. (The reference's shipped
  `compute_collision_reward` only populates its dim-3 branch and leaves the
  [B, N, T, 2] path as commented-out code — `criticmodel.py:42-86`; we
  implement that intended general path.)
* comfort: -0.1 * mean |jerk| of the *scaled* longitudinal acceleration.

Everything is fused gathers/reductions on device — the reference runs this
per PPO collection step on GPU and then round-trips the result through a CPU
replay deque; here the result feeds the on-device ring buffer directly.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.ops.geometry import transform_points


def drivable_values_at(
    traj_xy: jnp.ndarray, drivable_map: jnp.ndarray, raster_from_agent: jnp.ndarray
) -> jnp.ndarray:
    """Gather drivable-map values under trajectory points.

    traj_xy [B, ..., 2] agent-frame -> [B, ...] in {0, 1}.
    Mirrors the round/clamp/gather of `criticmodel.py:12-23`.
    """
    traj_raster = transform_points(traj_xy, raster_from_agent)
    cols = jnp.clip(jnp.round(traj_raster[..., 0]), 0, drivable_map.shape[-1] - 1).astype(jnp.int32)
    rows = jnp.clip(jnp.round(traj_raster[..., 1]), 0, drivable_map.shape[-2] - 1).astype(jnp.int32)
    b_idx = jnp.arange(drivable_map.shape[0]).reshape(
        (-1,) + (1,) * (traj_xy.ndim - 2)
    )
    return drivable_map[b_idx, rows, cols]


def offroad_reward(
    traj_xy: jnp.ndarray, batch: TrafficBatch
) -> jnp.ndarray:
    """[B, N, T, 2] -> [B, N]: -1 per off-drivable step (`criticmodel.py:12-29`)."""
    vals = drivable_values_at(traj_xy, batch.drivable_map, batch.raster_from_agent)
    return -jnp.sum(vals <= 0, axis=-1).astype(jnp.float32)


def collision_reward(
    traj_xy: jnp.ndarray, batch: TrafficBatch, collision_thresh: float = 0.8
) -> jnp.ndarray:
    """[B, N, T, 2] -> [B, N]: -count of (neighbor, step) proximity events
    (`criticmodel.py:42-64`, generalized dim-4 path)."""
    other = batch.all_other_agents_future_positions  # [B, S, T', 2]
    avail = batch.all_other_agents_future_availability > 0  # [B, S, T']
    T = min(traj_xy.shape[-2], other.shape[-2])
    traj = traj_xy[..., :T, :]
    other = other[..., :T, :]
    avail = avail[..., :T]
    # [B, N, 1, T, 2] - [B, 1, S, T, 2]
    diff = traj[:, :, None] - other[:, None]
    dist = jnp.linalg.norm(diff, axis=-1)  # [B, N, S, T]
    hits = (dist < collision_thresh) & avail[:, None]
    return -jnp.sum(hits, axis=(2, 3)).astype(jnp.float32)


def jerk_penalty(acc_scaled: jnp.ndarray, dt: float = 0.1) -> jnp.ndarray:
    """[B, N, T] scaled long. acceleration -> [B, N] mean |jerk|
    (`criticmodel.py:32-36`)."""
    jerk = (acc_scaled[..., 1:] - acc_scaled[..., :-1]) / dt
    return jnp.mean(jnp.abs(jerk), axis=-1)


def compute_reward(
    state_act: jnp.ndarray,
    batch: TrafficBatch,
    state_act_scaled: jnp.ndarray,
    collision_thresh: float = 0.8,
    dt: float = 0.1,
) -> jnp.ndarray:
    """[B, N, T, 6] descaled + scaled trajectories -> flat reward [B*N]
    (`criticmodel.py:7-40`)."""
    traj = state_act[..., :2]
    r_off = offroad_reward(traj, batch)
    r_col = collision_reward(traj, batch, collision_thresh)
    r_jerk = jerk_penalty(state_act_scaled[..., 4], dt)
    return (r_off + r_col - 0.1 * r_jerk).reshape(-1)


def failure_rate(
    state_action: jnp.ndarray, batch: TrafficBatch, collision_thresh: float = 0.8
) -> Dict[str, jnp.ndarray]:
    """[B, T, 6] descaled trajectories -> offroad/collision/overall failure
    rates (`criticmodel.py:114-145`)."""
    traj = state_action[..., :2]
    vals = drivable_values_at(traj, batch.drivable_map, batch.raster_from_agent)
    no_offroad = jnp.all(vals > 0, axis=-1).astype(jnp.float32).mean()
    r_col = collision_reward(traj[:, None], batch, collision_thresh)[:, 0]
    no_collision = (r_col >= 0).astype(jnp.float32).mean()
    off_rate = 1.0 - no_offroad
    col_rate = 1.0 - no_collision
    return {
        "offroad_failure_rate": off_rate,
        "collision_failure_rate": col_rate,
        "overall_failure_rate": (off_rate + col_rate) / 2.0,
    }
