"""Action/Plan containers.

Parity with `/root/reference/src/tbsim/policies/common.py:65-140`
(Action/Plan/RolloutAction dataclasses), as pytree NamedTuples. A policy in
cld_tpu is a pure function `(obs: TrafficBatch, rng) -> Action` usable inside
the closed-loop scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Action(NamedTuple):
    positions: jnp.ndarray  # [B, T, 2] agent frame
    yaws: jnp.ndarray  # [B, T, 1]
    # optional unicycle controls; when present the simulator steps with these
    controls: Optional[jnp.ndarray] = None  # [B, T, 2] (acc, yawvel)


class Plan(NamedTuple):
    positions: jnp.ndarray
    yaws: jnp.ndarray
    availabilities: jnp.ndarray


def action_from_trajectory(traj: jnp.ndarray) -> Action:
    """[B, T, 6] (x, y, v, yaw, acc, yawvel) -> Action."""
    return Action(
        positions=traj[..., :2], yaws=traj[..., 3:4], controls=traj[..., 4:6]
    )
