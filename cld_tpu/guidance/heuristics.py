"""Heuristic guidance construction from scene state.

Capability parity with `compute_heuristic_guidance`
(`/root/reference/src/tbsim/utils/scene_edit_utils.py:230-809`): the
reference builds guidance configs automatically from the current scene — a
target speed from history, a goal from the GT future, a stop region ahead of
an agent, or an adversarial collision pair. These builders produce
`GuidanceSpec` lists from a `ScenePack` + `SimState`, so rollout.py can do
`--editing-source heuristic` without hand-written configs.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.guidance.losses import (
    AgentCollisionLoss,
    CollisionAttackLoss,
    GlobalTargetPosLoss,
    KeepDistanceLoss,
    LaneFollowingLoss,
    MapCollisionLoss,
    SocialGroupLoss,
    SpeedLimitLoss,
    StopSignLoss,
    TargetSpeedLoss,
)
from cld_tpu.guidance.perturbation import GuidanceSpec


def heuristic_target_speed(pack, state, speed_scale: float = 1.0, weight: float = 1.0):
    """Hold each agent near its current speed x scale
    (`scene_edit_utils.py` heuristic_target_speed)."""
    target = np.asarray(state.states[:, 2]) * speed_scale
    return GuidanceSpec(TargetSpeedLoss(target_speed=target), weight)


def _uniform_scene_block(pack):
    """Agents-per-scene when the pack lays agents out as contiguous
    equal-size scene blocks (every cld_tpu ScenePack constructor does);
    None otherwise. Lets AgentCollisionLoss use its block-diagonal path."""
    if pack is None or getattr(pack, "scene_index", None) is None:
        return None
    si = np.asarray(pack.scene_index)
    _, counts = np.unique(si, return_counts=True)
    if len(np.unique(counts)) != 1:
        return None
    a = int(counts[0])
    if a <= 1 or len(si) % a:
        return None
    return a if np.array_equal(si, np.repeat(si[::a], a)) else None


def heuristic_agent_collision(
    weight: float = 10.0, num_disks: int = 5, buffer_dist: float = 0.2, pack=None
):
    return GuidanceSpec(
        AgentCollisionLoss(
            num_disks=num_disks, buffer_dist=buffer_dist,
            scene_block=_uniform_scene_block(pack),
        ),
        weight,
    )


def heuristic_map_collision(weight: float = 10.0):
    return GuidanceSpec(MapCollisionLoss(), weight)


def heuristic_speed_limit(speed_limit: float = 15.0, weight: float = 1.0):
    return GuidanceSpec(SpeedLimitLoss(speed_limit=speed_limit), weight)


def heuristic_lane_following(pack, state, weight: float = 1.0, **kw):
    """Keep agents near lane centers (`scene_edit_utils.py` lane heuristics;
    the closest-lane context is produced per replan from the ScenePack's
    lane polylines — see rollout.make_dm_policy / ops/lanes.py)."""
    if getattr(pack, "lane_points", None) is None:
        return None
    return GuidanceSpec(LaneFollowingLoss(**kw), weight)


def heuristic_global_target_pos(pack, state, horizon_s: float = 10.0, weight: float = 1.0):
    """Goal = constant-velocity extrapolation of each agent
    (`heuristic_global_target_pos`: progress toward a forward goal)."""
    s = np.asarray(state.states)
    goal = s[:, :2] + horizon_s * s[:, 2:3] * np.stack(
        [np.cos(s[:, 3]), np.sin(s[:, 3])], axis=-1
    )
    return GuidanceSpec(GlobalTargetPosLoss(target_pos_world=goal, urgency=0.7), weight)


def heuristic_stop_sign(pack, state, ahead_m: float = 15.0, box_half=(5.0, 3.0), weight: float = 5.0):
    """Stop region a fixed distance ahead of each agent (agent frame)."""
    B = pack.num_agents
    center = np.tile([ahead_m, 0.0], (B, 1)).astype(np.float32)
    dim = np.tile(box_half, (B, 1)).astype(np.float32)
    return GuidanceSpec(StopSignLoss(stop_box_center=center, stop_box_dim=dim), weight)


def heuristic_collision_attack(attacker: int, victim: int, weight: float = 5.0,
                               time_lo: int = 20, time_hi: int = 52):
    """Adversarial pair: steer `attacker` into `victim`
    (`heuristic_gptcollision`)."""
    return GuidanceSpec(
        CollisionAttackLoss(attacker_ind=attacker, victim_ind=victim,
                            time_lo=time_lo, time_hi=time_hi),
        weight,
    )


def heuristic_keep_distance(target: int, ref: int, min_dist=5.0, max_dist=15.0, weight=2.0):
    return GuidanceSpec(
        KeepDistanceLoss(target_ind=target, ref_ind=ref, min_dist=min_dist, max_dist=max_dist),
        weight,
    )


def _replay_future_states(pack, state, num_frames: int) -> np.ndarray:
    """GT future world states by rolling the replay actions through the
    unicycle (the on-device stand-in for `get_agents_future`,
    `scene_edit_utils.py:286-300`): [Na, num_frames, 4]. One jitted scan +
    one transfer — a per-frame eager loop here would dispatch hundreds of
    serial ~100 ms RPCs on the tunnel TPU (CLAUDE.md)."""
    from cld_tpu.ops.dynamics import UnicycleParams, unicycle_step

    dyn = UnicycleParams()
    t0 = jnp.asarray(state.step, jnp.int32)
    T_rep = pack.replay_actions.shape[1]

    @jax.jit
    def roll(states, replay, t0):
        ks = jnp.minimum(t0 + jnp.arange(num_frames), T_rep - 1)

        def step(s, k):
            nxt = unicycle_step(dyn, s, replay[:, k], 0.1, bound=True)
            return nxt, nxt

        _, traj = jax.lax.scan(step, states, ks)
        return jnp.swapaxes(traj, 0, 1)  # [Na, num_frames, 4]

    return np.asarray(roll(jnp.asarray(state.states), pack.replay_actions, t0))


def heuristic_social_group(
    pack, state, group_dist_thresh: float = 10.0, social_dist: float = 2.0,
    cohesion: float = 0.8, weight: float = 2.0, seed: int = 0,
) -> List[GuidanceSpec]:
    """Connected components of the proximity + co-direction graph become
    social groups (`heuristic_social_group`, `scene_edit_utils.py:230-278`,
    numpy union-find instead of scipy csgraph)."""
    s = np.asarray(state.states)
    pos, vel_mag, yaw = s[:, :2], s[:, 2], s[:, 3]
    vel = vel_mag[:, None] * np.stack([np.cos(yaw), np.sin(yaw)], axis=-1)
    not_moving = np.abs(vel_mag) < 0.9
    d = vel / (np.linalg.norm(vel, axis=-1, keepdims=True) + 1e-6)
    cos_sim = d @ d.T
    move_sim = cos_sim >= 0
    move_sim[not_moving, :] = True
    move_sim[:, not_moving] = True
    dist = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    scene = np.asarray(pack.scene_index)
    adj = (dist <= group_dist_thresh) & move_sim & (scene[:, None] == scene[None])
    np.fill_diagonal(adj, False)

    # union-find over the adjacency
    parent = np.arange(len(pos))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, j in zip(*np.nonzero(adj)):
        parent[find(i)] = find(j)
    roots = np.array([find(i) for i in range(len(pos))])

    specs = []
    for r in np.unique(roots):
        members = tuple(int(i) for i in np.nonzero(roots == r)[0])
        if len(members) > 1:  # only want groups, not single agents
            specs.append(
                GuidanceSpec(
                    SocialGroupLoss(group=members, social_dist=social_dist,
                                    cohesion=cohesion),
                    weight,
                )
            )
    return specs


def heuristic_target_pos_at_time(pack, state, target_time: int = 40,
                                 weight: float = 1.0, perturb_std: float = 0.0,
                                 seed: int = 0) -> GuidanceSpec:
    """Waypoint = the GT (replay) position at `target_time` frames ahead,
    in each agent's current frame (`heuristic_target_pos_at_time`,
    `scene_edit_utils.py:345-384`)."""
    from cld_tpu.guidance.losses import TargetPosAtTimeLoss

    fut = _replay_future_states(pack, state, target_time)
    tgt_world = fut[:, -1, :2]
    if perturb_std > 0:
        tgt_world = tgt_world + np.random.default_rng(seed).normal(
            0, perturb_std, tgt_world.shape
        )
    # world -> each agent's current frame
    s = np.asarray(state.states)
    c, si = np.cos(s[:, 3]), np.sin(s[:, 3])
    rel = tgt_world - s[:, :2]
    local = np.stack([c * rel[:, 0] + si * rel[:, 1],
                      -si * rel[:, 0] + c * rel[:, 1]], axis=-1)
    tt = np.full(len(local), target_time - 1, np.int64)
    return GuidanceSpec(
        TargetPosAtTimeLoss(target_pos=local.astype(np.float32), target_time=tt),
        weight,
    )


def heuristic_global_target_pos_at_time(
    pack, state, target_time: int = 60, urgency: float = 0.5,
    pref_speed: float | None = None, target_tolerance: float = 2.0,
    weight: float = 1.0,
) -> GuidanceSpec:
    """Global waypoint+time from the GT future
    (`heuristic_global_target_pos_at_time`, `scene_edit_utils.py:280-333`);
    pref_speed defaults to the GT average speed."""
    from cld_tpu.guidance.losses import GlobalTargetPosAtTimeLoss

    fut = _replay_future_states(pack, state, target_time)
    tgt = fut[:, -1, :2].astype(np.float32)
    if pref_speed is None:
        pref_speed = float(np.mean(np.abs(fut[:, :, 2])))
    t0 = int(np.asarray(state.step))
    # fut[:, k] is the state AFTER k+1 steps, so fut[:, -1] is the state at
    # global frame t0 + target_time reached by PLAN index target_time - 1
    # (GlobalTargetPosAtTimeLoss indexes the plan at tt - global_t); the
    # local heuristic_target_pos_at_time uses the same -1 convention
    tt = np.full(len(tgt), t0 + target_time - 1, np.int64)
    return GuidanceSpec(
        GlobalTargetPosAtTimeLoss(
            target_pos_world=tgt, target_time=tt,
            urgency=np.full(len(tgt), urgency, np.float32),
            pref_speed=pref_speed, target_tolerance=target_tolerance,
        ),
        weight,
    )


def heuristic_global_stop_sign(pack, state, ahead_m: float = 15.0,
                               box_dim=(10.0, 6.0), weight: float = 5.0,
                               num_time_steps_to_stop: int = 3,
                               low_speed_th: float = 0.5) -> GuidanceSpec:
    """World-frame stop box a fixed distance ahead of each agent
    (`heuristic_global_stop_sign`, `scene_edit_utils.py:426-471`)."""
    from cld_tpu.guidance.losses import GlobalStopSignLoss

    s = np.asarray(state.states)
    center = s[:, :2] + ahead_m * np.stack([np.cos(s[:, 3]), np.sin(s[:, 3])], -1)
    dim = np.tile(box_dim, (len(center), 1)).astype(np.float32)
    return GuidanceSpec(
        GlobalStopSignLoss(
            stop_sign_pos=center.astype(np.float32), stop_box_dim=dim,
            num_time_steps_to_stop=num_time_steps_to_stop,
            low_speed_th=low_speed_th,
        ),
        weight,
    )


HEURISTIC_MAP = {
    "target_speed": heuristic_target_speed,
    "agent_collision": lambda pack, state, **kw: heuristic_agent_collision(pack=pack, **kw),
    "map_collision": lambda pack, state, **kw: heuristic_map_collision(**kw),
    "speed_limit": lambda pack, state, **kw: heuristic_speed_limit(**kw),
    "lane_following": heuristic_lane_following,
    "global_target_pos": heuristic_global_target_pos,
    "stop_sign": heuristic_stop_sign,
    "social_group": heuristic_social_group,
    "target_pos_at_time": heuristic_target_pos_at_time,
    "global_target_pos_at_time": heuristic_global_target_pos_at_time,
    "global_stop_sign": heuristic_global_stop_sign,
}


def compute_heuristic_guidance(names: Sequence[str], pack, state) -> List[GuidanceSpec]:
    """Build specs for the requested heuristics
    (`compute_heuristic_guidance`, `scene_edit_utils.py:809-907`). Builders
    may emit one spec or a list (social_group emits one per group)."""
    specs: List[GuidanceSpec] = []
    for n in names:
        built = HEURISTIC_MAP[n](pack, state)
        if built is None:
            continue
        specs.extend(built if isinstance(built, list) else [built])
    return specs
