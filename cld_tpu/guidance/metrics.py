"""Guidance-satisfaction metrics.

Capability parity with `/root/reference/src/tbsim/utils/guidance_metrics.py:35-930`:
every guidance rule has a mirror metric that scores the EXECUTED closed-loop
trajectory (not the plan) so rollouts report how well each rule was actually
satisfied. Here the mirror is free: the losses are already pure functions of
trajectories, so the metric is the loss evaluated at N=1 on the executed
[B, T, 6] world history.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from cld_tpu.guidance.losses import GuidanceContext
from cld_tpu.guidance.perturbation import GuidanceSpec
from cld_tpu.ops.dynamics import angle_diff


def executed_traj_from_states(states: jnp.ndarray, dt: float = 0.1) -> jnp.ndarray:
    """[T, B, 4] simulator log (x, y, v, yaw world) -> [B, 1, T, 6]
    state+action trajectories for metric evaluation.

    Velocity and yaw come straight from the simulator state (they are
    exact); acc/yawvel are finite differences of those channels. Positions
    stay world-frame — rules evaluated on executed trajectories use an
    identity world_from_agent. (Inverse dynamics on the world-frame
    positions would pre-pad a zero pose as the 'origin' and fabricate huge
    first-step velocities.)
    """
    s = states.transpose(1, 0, 2)  # [B, T, 4]
    v = s[..., 2:3]
    yaw = s[..., 3:4]
    acc = jnp.diff(v, axis=-2, prepend=v[..., :1, :]) / dt
    yawvel = angle_diff(yaw[..., 1:, :], yaw[..., :-1, :]) / dt
    yawvel = jnp.concatenate([yawvel[..., :1, :] * 0, yawvel], axis=-2)
    sa = jnp.concatenate([s[..., :2], v, yaw, acc, yawvel], axis=-1)
    return sa[:, None]  # [B, 1, T, 6]


def guidance_metrics(
    specs: Sequence[GuidanceSpec], executed: jnp.ndarray, ctx: GuidanceContext
) -> Dict[str, np.ndarray]:
    """Per-rule satisfaction values on the executed trajectory
    (`guidance_metrics_from_config`, `guidance_metrics.py:896-930`).

    Returns {rule_name_i: [B] loss value} — 0 means fully satisfied.
    """
    out: Dict[str, np.ndarray] = {}
    for i, spec in enumerate(specs):
        mask = (
            jnp.asarray(spec.agent_mask)
            if spec.agent_mask is not None
            else jnp.ones((executed.shape[0],), dtype=bool)
        )
        val = spec.loss(executed, ctx, agt_mask=mask)[:, 0]  # [B]
        val = jnp.where(mask, val, jnp.nan)
        out[f"{type(spec.loss).__name__}_{i}"] = np.asarray(val)
    return out
