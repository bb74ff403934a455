"""Hardcoded policies for testing and replay.

Parity with `/root/reference/src/tbsim/policies/hardcoded.py`: `GTPolicy`
(:98, echo the dataset's GT future), `ReplayPolicy` (:144, replay a logged
action sequence), plus the MockModel-style constant policy used by the
closed-loop tests (l5kit `unroll_test.py:14-28` pattern).
"""

from __future__ import annotations

import jax.numpy as jnp

from cld_tpu.policies.common import Action


def gt_policy(obs, rng) -> Action:
    """Echo the batch's ground-truth future (`GTPolicy:98-120`)."""
    return Action(positions=obs.target_positions, yaws=obs.target_yaws)


def replay_policy(action_log: jnp.ndarray, dt_steps_offset: int = 0):
    """Replay logged controls [B, T_total, 2] starting at the current sim
    step (`ReplayPolicy:144-200`). The sim passes step via obs-free closure;
    here the simulator's replay path handles indexing, so this policy simply
    serves a fixed-plan window."""

    def policy(obs, rng) -> Action:
        B = obs.curr_speed.shape[0]
        T = action_log.shape[1]
        return Action(
            positions=jnp.zeros((B, T, 2)),
            yaws=jnp.zeros((B, T, 1)),
            controls=action_log,
        )

    return policy


def constant_policy(acc: float = 0.0, yawvel: float = 0.0, horizon: int = 52):
    """Constant-control mock policy (the unroll_test MockModel pattern)."""

    def policy(obs, rng) -> Action:
        B = obs.curr_speed.shape[0]
        u = jnp.zeros((B, horizon, 2)).at[..., 0].set(acc).at[..., 1].set(yawvel)
        return Action(
            positions=jnp.zeros((B, horizon, 2)),
            yaws=jnp.zeros((B, horizon, 1)),
            controls=u,
        )

    return policy
