"""Guidance loss library — pure cost functions over trajectories.

Capability parity with the registered losses in `GUIDANCE_FUNC_MAP`
(`/root/reference/src/tbsim/utils/guidance_loss.py:2087-2103`). Every loss
is a small dataclass of *static* parameters whose `__call__` maps
(x [B, N, T, 6], ctx, agt_mask [B]) -> [B, N], with 6 = (x, y, vel, yaw,
acc, yawvel) in descaled units. All shapes are static; raggedness (scenes,
guided-agent subsets, overlap steps) is expressed with masks, never gathers,
so a loss jits into the sampling scan.

Gradient masking matches the reference: non-guided/stationary agents see
`stop_gradient`ed inputs so guidance never leaks into them
(`guidance_loss.py:516-533`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.ops.geometry import transform_points


class GuidanceContext(NamedTuple):
    """Static-shape scene context consumed by guidance losses (the subset of
    the reference's data_batch that losses read)."""

    drivable_map: jnp.ndarray  # [B, H, W]
    raster_from_agent: jnp.ndarray  # [B, 3, 3]
    extent: jnp.ndarray  # [B, 3]
    curr_speed: jnp.ndarray  # [B]
    world_from_agent: jnp.ndarray  # [B, 3, 3]
    scene_index: jnp.ndarray  # [B] int: which scene each agent belongs to
    # optional lane polylines for lane_following: [B, L, 3] (x, y, yaw) in
    # agent frame with NaN/inf-free padding masked by lane_avail [B, L]
    lane_points: Optional[jnp.ndarray] = None
    lane_avail: Optional[jnp.ndarray] = None


def masked_mean(per_agent: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of [B, N] entries over agents where mask[B] is True."""
    m = mask[:, None].astype(per_agent.dtype)
    return jnp.sum(per_agent * m) / jnp.clip(jnp.sum(m) * per_agent.shape[1], 1e-6)


def _decay_weights(T: int, decay_rate: float) -> jnp.ndarray:
    w = decay_rate ** np.arange(T)
    return jnp.asarray(w / w.sum(), dtype=jnp.float32)


def _mask_gradient(x: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """stop_gradient for agents where keep[B] is False."""
    keep = keep.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(keep, x, jax.lax.stop_gradient(x))


def _to_world(x: jnp.ndarray, world_from_agent: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Agent-frame (pos, yaw) -> world frame. x [B, N, T, 6]."""
    pos = transform_points(x[..., :2], world_from_agent)
    # yaw offset = rotation angle of the transform
    dyaw = jnp.arctan2(world_from_agent[:, 1, 0], world_from_agent[:, 0, 0])
    yaw = x[..., 3:4] + dyaw[:, None, None, None]
    return pos, yaw


@dataclasses.dataclass(frozen=True)
class TargetSpeedLoss:
    """Follow a per-agent target speed profile (`guidance_loss.py:219-255`)."""

    target_speed: Tuple[float, ...] | np.ndarray  # [B] or [B, T]
    dt: float = 0.1

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        tgt = jnp.asarray(self.target_speed, dtype=jnp.float32)
        if tgt.ndim == 1:
            tgt = tgt[:, None]
        dev = jnp.abs(x[..., 2] - tgt[:, None, :])  # [B, N, T]
        return jnp.mean(jnp.nan_to_num(dev), axis=-1)


@dataclasses.dataclass(frozen=True)
class AgentCollisionLoss:
    """Scene-level pairwise disk-collision penalty
    (`guidance_loss.py:442-625`): each agent is approximated by num_disks
    circles along its length; penalty 1 - d/penalty_dist for colliding
    pairs, exponentially decayed over time, averaged over other agents."""

    num_disks: int = 5
    buffer_dist: float = 0.2
    decay_rate: float = 0.9
    guide_moving_speed_th: float = 0.5

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        B, N, T, _ = x.shape
        moving = jnp.abs(ctx.curr_speed) > self.guide_moving_speed_th
        x = _mask_gradient(x, moving)
        if agt_mask is not None:
            x = _mask_gradient(x, agt_mask)

        pos_w, yaw_w = _to_world(x, ctx.world_from_agent)

        # disks along the vehicle length axis (agent local frame)
        agt_rad = ctx.extent[:, 1] / 2.0  # [B]
        cent_min = -(ctx.extent[:, 0] / 2.0) + agt_rad
        cent_max = (ctx.extent[:, 0] / 2.0) - agt_rad
        lin = jnp.linspace(0.0, 1.0, self.num_disks)
        cent_x = cent_min[:, None] + (cent_max - cent_min)[:, None] * lin[None]  # [B, D]
        centroids = jnp.stack([cent_x, jnp.zeros_like(cent_x)], axis=-1)  # [B, D, 2]

        # rotate disks into world frame and attach to trajectory
        c = jnp.cos(yaw_w)[..., None]  # [B, N, T, 1, 1]
        s = jnp.sin(yaw_w)[..., None]
        # row-vector convention of the reference: p @ [[c, s], [-s, c]]
        cent = centroids[:, None, None]  # [B, 1, 1, D, 2]
        rx = cent[..., 0] * c[..., 0] + cent[..., 1] * (-s[..., 0])
        ry = cent[..., 0] * s[..., 0] + cent[..., 1] * c[..., 0]
        cent_w = jnp.stack([rx, ry], axis=-1) + pos_w[..., None, :]  # [B, N, T, D, 2]

        penalty_dists = agt_rad[:, None] + agt_rad[None, :] + self.buffer_dist  # [B, B]
        same_scene = ctx.scene_index[:, None] == ctx.scene_index[None, :]
        pair_valid = same_scene & ~jnp.eye(B, dtype=bool)

        # min distance over disk pairs for every agent pair: [N, T, B, B]
        d = cent_w.transpose(1, 2, 0, 3, 4)  # [N, T, B, D, 2]
        diff = d[:, :, :, None, :, None, :] - d[:, :, None, :, None, :, :]
        dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)  # [N, T, B, B, D, D]
        pair_dists = jnp.min(dist.reshape(N, T, B, B, -1), axis=-1)

        colliding = (pair_dists <= penalty_dists[None, None]) & pair_valid[None, None]
        penalties = jnp.where(colliding, 1.0 - pair_dists / penalty_dists[None, None], 0.0)

        w = _decay_weights(T, self.decay_rate)
        per_agent = jnp.sum(penalties * w[None, :, None, None], axis=1)  # [N, B, B]
        per_agent = jnp.mean(per_agent, axis=-1).transpose(1, 0)  # [B, N]
        return jnp.where(moving[:, None], per_agent, 0.0)


@dataclasses.dataclass(frozen=True)
class MapCollisionLoss:
    """Offroad penalty with an on-road-pull gradient
    (`guidance_loss.py:717-871`): sample a grid of points in each agent
    bbox; for off-road points, maximize distance to (detached) on-road
    points via loss 1 - min_dist/diag."""

    num_points_lw: Tuple[int, int] = (10, 10)
    decay_rate: float = 0.9
    guide_moving_speed_th: float = 0.5

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        B, N, T, _ = x.shape
        P = self.num_points_lw[0] * self.num_points_lw[1]
        lwise = np.linspace(-0.5, 0.5, self.num_points_lw[0])
        wwise = np.linspace(-0.5, 0.5, self.num_points_lw[1])
        local = jnp.asarray(
            np.stack(np.meshgrid(lwise, wwise, indexing="ij"), -1).reshape(-1, 2),
            dtype=jnp.float32,
        )  # [P, 2]

        pos = x[..., :2]  # [B, N, T, 2]
        yaw = x[..., 3]
        lw = ctx.extent[:, :2]
        diag_len = jnp.sqrt(jnp.sum(lw * lw, axis=-1))  # [B]

        pts = local[None] * lw[:, None, :]  # [B, P, 2]
        c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]  # [B, N, T, 1]
        px = pts[:, None, None, :, 0]
        py = pts[:, None, None, :, 1]
        # row-vector rotation p @ [[c, s], [-s, c]] (guidance_loss.py:745-748)
        rx = px * c + py * (-s)
        ry = px * s + py * c
        agt_pts = jnp.stack([rx, ry], axis=-1) + pos[..., None, :]  # [B, N, T, P, 2]

        # raster query (detached ints)
        pix = transform_points(agt_pts.reshape(B, -1, 2), ctx.raster_from_agent)
        pix = jax.lax.stop_gradient(pix.reshape(B, N, T, P, 2))
        H, W = ctx.drivable_map.shape[-2:]
        col = jnp.clip(pix[..., 0].astype(jnp.int32), 0, W - 1)
        row = jnp.clip(pix[..., 1].astype(jnp.int32), 0, H - 1)
        b_idx = jnp.arange(B).reshape(B, 1, 1, 1)
        offroad = ctx.drivable_map[b_idx, row, col] <= 0  # [B, N, T, P]

        per_step_coll = jnp.sum(offroad, axis=-1)
        overlap = (per_step_coll > 0) & (per_step_coll < P)  # [B, N, T]

        # pairwise distances rows=live points, cols=detached points
        # (guidance_loss.py:826-850): mask off-road ROWS to +inf, min over
        # rows -> per detached point, distance to the nearest live on-road
        # point. Loss 1 - d/diag at off-road columns then *pushes the live
        # on-road points away from the (fixed) off-road region*, i.e. pulls
        # the agent back onto the road.
        flat = agt_pts.reshape(-1, P, 2)
        flat_det = jax.lax.stop_gradient(flat)
        d2 = jnp.sum((flat[:, :, None, :] - flat_det[:, None, :, :]) ** 2, axis=-1)
        dists = jnp.sqrt(d2 + 1e-12)  # [BNT, P(live rows), P(detached cols)]
        offroad_flat = offroad.reshape(-1, P)
        dists = jnp.where(offroad_flat[:, :, None], jnp.inf, dists)
        min_dist = jnp.min(dists, axis=1)  # [BNT, P] over live rows
        diag = jnp.repeat(diag_len, N * T)[:, None]
        pt_loss = 1.0 - min_dist / diag
        pt_loss = jnp.where(offroad_flat, pt_loss, 0.0)
        # steps fully on/off road contribute nothing (no gradient direction)
        step_loss = jnp.where(
            overlap.reshape(-1), jnp.nansum(jnp.where(jnp.isfinite(pt_loss), pt_loss, 0.0), axis=-1), 0.0
        ).reshape(B, N, T)

        moving = jnp.abs(ctx.curr_speed) > self.guide_moving_speed_th
        step_loss = jnp.where(moving[:, None, None], step_loss, 0.0)
        w = _decay_weights(T, self.decay_rate)
        return jnp.sum(step_loss * w[None, None, :], axis=-1)


@dataclasses.dataclass(frozen=True)
class TargetPosAtTimeLoss:
    """Hit waypoints at specific steps (`guidance_loss.py:632-670`)."""

    target_pos: np.ndarray  # [B, 2]
    target_time: np.ndarray  # [B] int

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        tgt = jnp.asarray(self.target_pos, jnp.float32)
        tt = jnp.asarray(self.target_time, jnp.int32)
        x_at = x[jnp.arange(x.shape[0]), :, tt, :2]  # [B, N, 2]
        return jnp.linalg.norm(x_at - tgt[:, None], axis=-1)


@dataclasses.dataclass(frozen=True)
class TargetPosLoss:
    """Hit waypoints at any sufficiently-late step, softmin-weighted
    (`guidance_loss.py:672-711`)."""

    target_pos: np.ndarray  # [B, 2]
    min_target_time: float = 0.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        T = x.shape[2]
        min_t = int(self.min_target_time * T)
        pos = x[:, :, min_t:, :2]
        tgt = jnp.asarray(self.target_pos, jnp.float32)[:, None, None]
        dist = jnp.linalg.norm(pos - tgt, axis=-1)
        weight = jax.nn.softmax(-dist, axis=-1)
        loss = weight * jnp.sum((pos - tgt) ** 2, axis=-1)
        return jnp.mean(loss, axis=-1)


@dataclasses.dataclass(frozen=True)
class GlobalTargetPosLoss:
    """Progress toward a world-frame goal beyond the horizon
    (`guidance_loss.py:838-930,1033-1135`, simplified progress form)."""

    target_pos_world: np.ndarray  # [B, 2]
    urgency: np.ndarray | float = 0.5
    pref_speed: float = 1.42
    dt: float = 0.1
    min_progress_dist: float = 0.5

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        pos_w, _ = _to_world(x, ctx.world_from_agent)
        tgt = jnp.asarray(self.target_pos_world, jnp.float32)
        urgency = jnp.broadcast_to(jnp.asarray(self.urgency, jnp.float32), (x.shape[0],))
        final_dist = jnp.linalg.norm(pos_w[:, :, -1] - tgt[:, None], axis=-1)
        init_dist = jnp.linalg.norm(pos_w[:, :, 0] - tgt[:, None], axis=-1)
        max_horizon_dist = x.shape[2] * self.dt * self.pref_speed
        goal_dist = jnp.maximum(urgency * max_horizon_dist, self.min_progress_dist)
        progress = init_dist - final_dist
        return jax.nn.relu(goal_dist[:, None] - progress)


@dataclasses.dataclass(frozen=True)
class AccLimitLoss:
    """Penalize |acc| above a limit (`guidance_loss.py:1444-1469`)."""

    acc_limit: float = 2.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        dev = jnp.abs(x[..., 4]) - self.acc_limit
        return jnp.mean(jax.nn.relu(dev), axis=-1)


@dataclasses.dataclass(frozen=True)
class SpeedLimitLoss:
    """Penalize |v| above a limit (`guidance_loss.py:1509-1538`)."""

    speed_limit: float = 15.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        dev = jnp.abs(x[..., 2]) - self.speed_limit
        return jnp.mean(jax.nn.relu(dev), axis=-1)


@dataclasses.dataclass(frozen=True)
class StopSignLoss:
    """Slow down inside a stop region (`guidance_loss.py:1214-1318`,
    box-region speed penalty form)."""

    stop_box_center: np.ndarray  # [B, 2] agent-frame center
    stop_box_dim: np.ndarray  # [B, 2] box half extents
    stop_speed: float = 0.0
    scale: float = 1.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        center = jnp.asarray(self.stop_box_center, jnp.float32)[:, None, None]
        half = jnp.asarray(self.stop_box_dim, jnp.float32)[:, None, None]
        inside = jnp.all(jnp.abs(x[..., :2] - center) <= half, axis=-1)  # [B, N, T]
        over = jax.nn.relu(jnp.abs(x[..., 2]) - self.stop_speed)
        return self.scale * jnp.mean(jnp.where(inside, over, 0.0), axis=-1)


@dataclasses.dataclass(frozen=True)
class KeepDistanceLoss:
    """Keep the distance between two agents inside [min_dist, max_dist]
    (`guidance_loss.py:1631-1739` keep_distance / gptkeepdistance)."""

    target_ind: int
    ref_ind: int
    min_dist: float = 5.0
    max_dist: float = 15.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        pos_w, _ = _to_world(x, ctx.world_from_agent)
        d = jnp.linalg.norm(
            pos_w[self.target_ind] - pos_w[self.ref_ind], axis=-1
        )  # [N, T]
        over = jax.nn.relu(d - self.max_dist) + jax.nn.relu(self.min_dist - d)
        loss = jnp.zeros(x.shape[:2])
        return loss.at[self.target_ind].set(jnp.mean(over, axis=-1))


@dataclasses.dataclass(frozen=True)
class CollisionAttackLoss:
    """Adversarial: steer the attacker toward colliding with the victim
    within a time window (`guidance_loss.py:1691-2105` gptcollision-style
    attack losses, simplified to the core minimize-distance objective)."""

    attacker_ind: int
    victim_ind: int
    time_lo: int = 0
    time_hi: int = 52
    decay_rate: float = 0.9

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        pos_w, _ = _to_world(x, ctx.world_from_agent)
        # victim trajectory is fixed (not steered by the attack)
        victim = jax.lax.stop_gradient(pos_w[self.victim_ind])
        # clamp the attack window to the trajectory length (executed
        # closed-loop trajectories can be shorter than the plan horizon)
        T = x.shape[-2]
        lo = min(self.time_lo, T - 1)
        hi = max(min(self.time_hi, T), lo + 1)
        d = jnp.linalg.norm(
            pos_w[self.attacker_ind, :, lo:hi] - victim[:, lo:hi],
            axis=-1,
        )  # [N, Tw]
        loss = jnp.zeros(x.shape[:2])
        return loss.at[self.attacker_ind].set(jnp.min(d, axis=-1))


@dataclasses.dataclass(frozen=True)
class SocialGroupLoss:
    """Agents in a social group stay within a preferred distance of the
    group (`guidance_loss.py:1137-1213`, cohesion form: penalize deviation
    of each member's distance-to-centroid from social_dist)."""

    group: Tuple[int, ...]
    social_dist: float = 2.0
    cohesion: float = 0.8

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        pos_w, _ = _to_world(x, ctx.world_from_agent)
        members = jnp.asarray(self.group)
        group_pos = pos_w[members]  # [G, N, T, 2]
        centroid = jnp.mean(group_pos, axis=0, keepdims=True)
        d = jnp.linalg.norm(group_pos - centroid, axis=-1)  # [G, N, T]
        dev = jnp.abs(d - self.social_dist) * self.cohesion
        per_member = jnp.mean(dev, axis=-1)  # [G, N]
        loss = jnp.zeros(x.shape[:2])
        return loss.at[members].set(per_member)


@dataclasses.dataclass(frozen=True)
class LaneFollowingLoss:
    """Stay near (and aligned with) the closest lane point
    (`guidance_loss.py:1574-1630` lane_following: per-step distance to the
    projected closest lane point + heading deviation, soft-assigned so the
    choice of lane point stays differentiable)."""

    pos_weight: float = 1.0
    yaw_weight: float = 0.5
    softmin_temp: float = 2.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        assert ctx.lane_points is not None, "ctx.lane_points required for lane_following"
        lanes = ctx.lane_points  # [B, L, 3]
        avail = (
            ctx.lane_avail if ctx.lane_avail is not None
            else jnp.ones(lanes.shape[:2], dtype=bool)
        )
        pos = x[..., :2]  # [B, N, T, 2]
        yaw = x[..., 3]
        d2 = jnp.sum(
            (pos[:, :, :, None, :] - lanes[:, None, None, :, :2]) ** 2, axis=-1
        )  # [B, N, T, L]
        d2 = jnp.where(avail[:, None, None, :], d2, jnp.inf)
        # soft assignment over lane points keeps gradients smooth
        w = jax.nn.softmax(-self.softmin_temp * jnp.sqrt(d2 + 1e-9), axis=-1)
        pos_dev = jnp.sum(w * jnp.sqrt(d2 + 1e-9), axis=-1)  # [B, N, T]
        lane_yaw = jnp.sum(w * lanes[:, None, None, :, 2], axis=-1)
        from cld_tpu.ops.dynamics import angle_diff

        yaw_dev = jnp.abs(angle_diff(yaw, lane_yaw))
        per_step = self.pos_weight * pos_dev + self.yaw_weight * yaw_dev
        return jnp.mean(per_step, axis=-1)


GUIDANCE_LOSS_MAP = {
    "target_speed": TargetSpeedLoss,
    "agent_collision": AgentCollisionLoss,
    "map_collision": MapCollisionLoss,
    "target_pos_at_time": TargetPosAtTimeLoss,
    "target_pos": TargetPosLoss,
    "global_target_pos": GlobalTargetPosLoss,
    "acc_limit": AccLimitLoss,
    "speed_limit": SpeedLimitLoss,
    "stop_sign": StopSignLoss,
    "keep_distance": KeepDistanceLoss,
    "collision_attack": CollisionAttackLoss,
    "social_group": SocialGroupLoss,
    "lane_following": LaneFollowingLoss,
}


def make_guidance_losses(configs: Sequence[Dict]) -> list:
    """Instantiate losses from reference-style config dicts
    ({'name', 'weight', 'params', 'agents'})."""
    out = []
    for cfg in configs:
        cls = GUIDANCE_LOSS_MAP[cfg["name"]]
        out.append((cls(**cfg.get("params", {})), cfg.get("weight", 1.0), cfg.get("agents")))
    return out
