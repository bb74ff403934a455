"""Learned (EBM) closed-loop realism metric.

Capability parity with `LearnedMetric`
(`/root/reference/src/tbsim/envs/env_metrics.py:649-959`): the reference
buffers `traj_len+1` host-side observation dicts during simulation and, once
full, scores the executed trajectory segment (expressed in the frame of the
buffer's first state) with the trained metric algo. Here the whole thing is
a post-rollout device computation over the simulator's world-frame
trajectory log: for each anchor frame we re-render the observation (the
on-device raster warp), transform the executed future into the anchor agent
frame, and score it with `PermuteEBM.get_scores` — one `lax.map` over
anchors, no host buffering.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cld_tpu.ops.geometry import transform_points
from cld_tpu.sim.env import SimConfig, SimState, render_observation
from cld_tpu.sim.scene import ScenePack


def _sim_state_at(traj: jnp.ndarray, t: jnp.ndarray, Th: int) -> SimState:
    """Reconstruct the SimState at frame t from the trajectory log
    [T, Na, 4] (history indices clamp at 0, mirroring the reference's
    buffer warm-up period)."""
    T, Na = traj.shape[:2]
    idx_h = jnp.clip(t - jnp.arange(Th - 1, -1, -1), 0, T - 1)  # [Th]
    hist = jnp.transpose(traj[idx_h], (1, 0, 2))  # [Na, Th, 4]
    zeros = jnp.zeros((Na,))
    return SimState(
        states=traj[t],
        history=hist,
        step=t.astype(jnp.int32),
        offroad_steps=zeros,
        collision_steps=zeros,
        collision_type_steps=jnp.zeros((Na, 3)),
        max_abs_acc=zeros,
        max_abs_yawvel=zeros,
    )


def ebm_rollout_scores(
    pack: ScenePack,
    traj: jnp.ndarray,  # [T, Na, 4] world-frame rollout log
    ebm_apply,  # (obs) -> [Na] matched-pair scores (PermuteEBM.get_scores bound)
    cfg: SimConfig,
    horizon: int = 52,
    stride: int = 10,
) -> jnp.ndarray:
    """Score the executed rollout at anchor frames 0, stride, 2*stride, ...
    Returns [num_anchors, Na] learned realism scores (higher = more like
    the data the EBM was trained on). Futures past the rollout end clamp to
    the last frame and are masked out of the availability channel, matching
    the reference's requirement that the buffer be full (`env_metrics.py:673`)
    — anchors are chosen so at least one future frame exists.
    """
    T = traj.shape[0]
    Th = cfg.hist_frames + 1
    anchors = jnp.arange(0, max(T - 1, 1), stride)

    def score_at(t):
        state = _sim_state_at(traj, t, Th)
        obs = render_observation(pack, state, cfg)
        fut_t = t + 1 + jnp.arange(horizon)  # [H]
        avail = (fut_t < T).astype(jnp.float32)  # [H]
        fut = traj[jnp.clip(fut_t, 0, T - 1)]  # [H, Na, 4]
        pos_w = jnp.transpose(fut[..., :2], (1, 0, 2))  # [Na, H, 2]
        pos_a = transform_points(pos_w, obs.agent_from_world)
        yaw_a = jnp.transpose(fut[..., 3], (1, 0))[..., None] - state.states[:, 3][:, None, None]
        obs = obs._replace(
            target_positions=pos_a,
            target_yaws=yaw_a,
            target_availabilities=jnp.broadcast_to(avail[None], pos_a.shape[:2]),
        )
        return ebm_apply(obs)

    return jax.lax.map(score_at, anchors)  # [A, Na]


def ebm_rollout_metric(
    pack: ScenePack,
    traj: jnp.ndarray,
    ebm_apply,
    cfg: SimConfig,
    horizon: int = 52,
    stride: int = 10,
) -> Dict[str, jnp.ndarray]:
    """Aggregate learned-metric summary for a rollout: mean/min score over
    anchors and agents (`env_metrics.py:720-760` get_episode_metrics)."""
    scores = ebm_rollout_scores(pack, traj, ebm_apply, cfg, horizon, stride)
    return {
        "ebm_score_mean": scores.mean(),
        "ebm_score_min": scores.min(),
        "ebm_score_per_agent": scores.mean(axis=0),
    }
