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


def heuristic_target_speed(pack, state, speed_scale: float = 1.0, weight: float = 1.0,
                           target_speed_multiplier: float | None = None,
                           fut_sec: float | None = None, dt: float = 0.1):
    """Hold each agent near a target speed (`scene_edit_utils.py:553-581`
    heuristic_target_speed). Reference spelling: the PER-TIMESTEP GT-future
    speed profile x `target_speed_multiplier` over `fut_sec` seconds
    (`target_speed = speed * target_speed_multiplier`, a [B, T] array);
    shorthand spelling: current speed x `speed_scale`."""
    if target_speed_multiplier is not None:
        frames = max(1, int(round((fut_sec or 5.0) / dt)))
        fut = _replay_future_states(pack, state, frames, dt=dt)
        target = np.abs(fut[:, :, 2]) * target_speed_multiplier  # [Na, frames]
    else:
        target = np.asarray(state.states[:, 2]) * speed_scale
    return GuidanceSpec(TargetSpeedLoss(target_speed=target, dt=dt), weight)


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
    weight: float = 10.0, num_disks: int = 5, buffer_dist: float = 0.2,
    decay_rate: float = 0.9, pack=None, excluded_agents=None, dt: float = 0.1,
):
    """`excluded_agents`: collisions among that set are un-penalized
    (reference AgentCollisionLoss ctor arg, `guidance_loss.py:447-464`) —
    pairs with only ONE excluded end still count. `dt` has no meaning for
    this rule; accepted for the uniform builder signature."""
    excluded = (
        tuple(int(i) for i in excluded_agents) if excluded_agents else None
    )
    # the block-diagonal fast path relies on contiguous same-size scene
    # blocks; the excluded-pair mask is supported by both paths
    return GuidanceSpec(
        AgentCollisionLoss(
            num_disks=num_disks, buffer_dist=buffer_dist, decay_rate=decay_rate,
            scene_block=_uniform_scene_block(pack), excluded_agents=excluded,
        ),
        weight,
    )


def heuristic_map_collision(weight: float = 10.0, num_points_lw=(10, 10),
                            decay_rate: float = 0.9, dt: float = 0.1):
    return GuidanceSpec(
        MapCollisionLoss(num_points_lw=tuple(num_points_lw),
                         decay_rate=decay_rate),
        weight,
    )


def heuristic_speed_limit(pack=None, state=None, speed_limit: float = 15.0,
                          weight: float = 1.0,
                          speed_limit_quantile: float | None = None,
                          low_speed_th: float = 0.5,
                          fut_sec: float | None = None, dt: float = 0.1):
    """Speed limit, either explicit or derived from the scene as the
    reference does (`scene_edit_utils.py:518-550`): the
    `speed_limit_quantile` of GT-future speeds over samples faster than
    `low_speed_th`; an all-stopped scene falls back to `low_speed_th`
    itself (the reference's NaN-quantile branch, line 538-540) instead of
    silently keeping the 15 m/s default."""
    if speed_limit_quantile is not None and pack is not None:
        frames = max(1, int(round((fut_sec or 5.0) / dt)))
        fut = _replay_future_states(pack, state, frames, dt=dt)
        speeds = np.abs(fut[:, :, 2])
        moving = speeds[speeds > low_speed_th]
        speed_limit = (
            float(np.nanquantile(moving, speed_limit_quantile))
            if moving.size else float(low_speed_th)
        )
        if np.isnan(speed_limit):
            speed_limit = float(low_speed_th)
    return GuidanceSpec(SpeedLimitLoss(speed_limit=speed_limit), weight)


def heuristic_lane_following(pack, state, weight: float = 1.0, dt: float = 0.1, **kw):
    """Keep agents near lane centers (`scene_edit_utils.py` lane heuristics;
    the closest-lane context is produced per replan from the ScenePack's
    lane polylines — see rollout.make_dm_policy / ops/lanes.py)."""
    if getattr(pack, "lane_points", None) is None:
        return None
    return GuidanceSpec(LaneFollowingLoss(**kw), weight)


def heuristic_global_target_pos(pack, state, horizon_s: float = 10.0,
                                weight: float = 1.0,
                                target_time: int | None = None,
                                urgency: float = 0.7,
                                pref_speed: float | None = None,
                                min_progress_dist: float = 0.5,
                                perturb_std: float = 0.0, seed: int = 0,
                                dt: float = 0.1,
                                **_host_only):
    """Goal toward a forward world-frame waypoint
    (`heuristic_global_target_pos`, `scene_edit_utils.py:335-343`). With the
    reference spelling (`target_time` frames) the goal is the GT future
    position; the shorthand spelling extrapolates constant velocity over
    `horizon_s`. Host-only reference knobs (`action_num` candidate count,
    `target_tolerance` for the non-timed loss) are accepted and ignored —
    filtration count is rollout's --num-action-samples."""
    if target_time is not None:
        fut = _replay_future_states(pack, state, int(target_time), dt=dt)
        goal = fut[:, -1, :2].astype(np.float64)
        if pref_speed is None:
            # PER-AGENT GT average speed (`scene_edit_utils.py:302-311`:
            # nansum(speed * valid) / frames per agent) — a fleet-wide mean
            # would give slow agents unreachable progress goals
            pref_speed = np.mean(np.abs(fut[:, :, 2]), axis=1)
    else:
        s = np.asarray(state.states)
        goal = s[:, :2] + horizon_s * s[:, 2:3] * np.stack(
            [np.cos(s[:, 3]), np.sin(s[:, 3])], axis=-1
        )
    if perturb_std > 0:
        goal = goal + np.random.default_rng(seed).normal(0, perturb_std, goal.shape)
    kw = {} if pref_speed is None else {
        "pref_speed": np.asarray(pref_speed, np.float32)
    }
    return GuidanceSpec(
        GlobalTargetPosLoss(
            target_pos_world=goal.astype(np.float32), urgency=urgency,
            min_progress_dist=min_progress_dist, dt=dt, **kw,
        ),
        weight,
    )


def heuristic_stop_sign(pack, state, ahead_m: float = 15.0, box_half=(5.0, 3.0),
                        weight: float = 5.0, target_time: int | None = None,
                        stop_box_dim=None, scale: float = 20.0, dt: float = 0.1,
                        num_time_steps_to_stop: int = 3,
                        low_speed_th: float = 0.5,
                        horizon_length: int | None = None,
                        **_host_only):
    """Stop region ahead of each agent, agent frame
    (`heuristic_stop_sign`, `scene_edit_utils.py:473-515`). Reference
    spelling: the box sits at the GT future position at `target_time`
    frames with FULL dims `stop_box_dim`; shorthand spelling: a fixed
    `ahead_m` offset with HALF extents `box_half`."""
    B = pack.num_agents
    if target_time is not None:
        fut = _replay_future_states(pack, state, int(target_time), dt=dt)
        s = np.asarray(state.states)
        c, si = np.cos(s[:, 3]), np.sin(s[:, 3])
        rel = fut[:, -1, :2] - s[:, :2]
        center = np.stack([c * rel[:, 0] + si * rel[:, 1],
                           -si * rel[:, 0] + c * rel[:, 1]], axis=-1)
    else:
        center = np.tile([ahead_m, 0.0], (B, 1))
    # StopSignLoss takes FULL dims (reference Box convention); the
    # shorthand spelling's box_half is half extents -> double it
    if stop_box_dim is not None:
        dim = np.tile(np.asarray(stop_box_dim, np.float32), (B, 1))
    else:
        dim = np.tile(np.asarray(box_half, np.float32) * 2.0, (B, 1))
    kw = {}
    if horizon_length is not None:
        kw["horizon_length"] = int(horizon_length)
    return GuidanceSpec(
        StopSignLoss(stop_sign_pos=center.astype(np.float32),
                     stop_box_dim=dim.astype(np.float32), scale=scale,
                     num_time_steps_to_stop=num_time_steps_to_stop,
                     low_speed_th=low_speed_th, **kw),
        weight,
    )


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


def _replay_future_states(pack, state, num_frames: int, dt: float = 0.1) -> np.ndarray:
    """GT future world states by rolling the replay actions through the
    unicycle (the on-device stand-in for `get_agents_future`,
    `scene_edit_utils.py:286-300`): [Na, num_frames, 4]. `dt` must match
    the sim step time the replay actions were recorded at. One jitted scan +
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
            nxt = unicycle_step(dyn, s, replay[:, k], dt, bound=True)
            return nxt, nxt

        _, traj = jax.lax.scan(step, states, ks)
        return jnp.swapaxes(traj, 0, 1)  # [Na, num_frames, 4]

    return np.asarray(roll(jnp.asarray(state.states), pack.replay_actions, t0))


def heuristic_social_group(
    pack, state, group_dist_thresh: float = 10.0, social_dist: float = 2.0,
    cohesion: float = 0.8, weight: float = 2.0, seed: int = 0,
    dt: float = 0.1,
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
                                 seed: int = 0, dt: float = 0.1) -> GuidanceSpec:
    """Waypoint = the GT (replay) position at `target_time` frames ahead,
    in each agent's current frame (`heuristic_target_pos_at_time`,
    `scene_edit_utils.py:345-384`)."""
    from cld_tpu.guidance.losses import TargetPosAtTimeLoss

    fut = _replay_future_states(pack, state, target_time, dt=dt)
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
    weight: float = 1.0, perturb_std: float = 0.0, seed: int = 0,
    dt: float = 0.1,
    **_host_only,
) -> GuidanceSpec:
    """Global waypoint+time from the GT future
    (`heuristic_global_target_pos_at_time`, `scene_edit_utils.py:280-333`);
    pref_speed defaults to the PER-AGENT GT average speed (reference
    lines 302-311: nansum(speed)/frames per agent). `action_num` (candidate
    count for filtration) is a rollout-level knob and is ignored here."""
    from cld_tpu.guidance.losses import GlobalTargetPosAtTimeLoss

    fut = _replay_future_states(pack, state, target_time, dt=dt)
    tgt = fut[:, -1, :2].astype(np.float32)
    if perturb_std > 0:
        tgt = (tgt + np.random.default_rng(seed).normal(
            0, perturb_std, tgt.shape
        )).astype(np.float32)
    if pref_speed is None:
        pref_speed = np.mean(np.abs(fut[:, :, 2]), axis=1)
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
            pref_speed=np.asarray(pref_speed, np.float32),
            target_tolerance=target_tolerance, dt=dt,
        ),
        weight,
    )


def heuristic_global_stop_sign(pack, state, ahead_m: float = 15.0,
                               box_dim=(10.0, 6.0), weight: float = 5.0,
                               num_time_steps_to_stop: int = 3,
                               low_speed_th: float = 0.5,
                               target_time: int | None = None,
                               stop_box_dim=None, scale: float = 20.0,
                               horizon_length: int | None = None,
                               action_num: int | None = None,
                               dt: float = 0.1) -> GuidanceSpec:
    """World-frame stop box ahead of each agent
    (`heuristic_global_stop_sign`, `scene_edit_utils.py:426-471`). Reference
    spelling: the box sits at the GT future position at `target_time` with
    full dims `stop_box_dim`; shorthand: fixed `ahead_m` offset."""
    from cld_tpu.guidance.losses import GlobalStopSignLoss

    s = np.asarray(state.states)
    if target_time is not None:
        fut = _replay_future_states(pack, state, int(target_time), dt=dt)
        center = fut[:, -1, :2]
    else:
        center = s[:, :2] + ahead_m * np.stack([np.cos(s[:, 3]), np.sin(s[:, 3])], -1)
    dim = np.tile(stop_box_dim if stop_box_dim is not None else box_dim,
                  (len(center), 1)).astype(np.float32)
    kw = {}
    if horizon_length is not None:
        kw["horizon_length"] = int(horizon_length)
    if action_num is not None:
        kw["action_num"] = int(action_num)
    return GuidanceSpec(
        GlobalStopSignLoss(
            stop_sign_pos=center.astype(np.float32), stop_box_dim=dim,
            num_time_steps_to_stop=num_time_steps_to_stop,
            low_speed_th=low_speed_th, scale=scale, **kw,
        ),
        weight,
    )


def heuristic_target_pos(pack, state, target_time: int = 40,
                         weight: float = 1.0, perturb_std: float = 0.0,
                         seed: int = 0, dt: float = 0.1) -> GuidanceSpec:
    """Untimed waypoint from the GT future (`heuristic_target_pos`,
    `scene_edit_utils.py:386-394`): the same waypoint as
    heuristic_target_pos_at_time but bound to a TargetPosLoss, which asks
    the trajectory to pass NEAR the point at any (late-enough) time instead
    of exactly at `target_time`."""
    from cld_tpu.guidance.losses import TargetPosLoss

    timed = heuristic_target_pos_at_time(
        pack, state, target_time=target_time, weight=weight,
        perturb_std=perturb_std, seed=seed, dt=dt,
    )
    return GuidanceSpec(TargetPosLoss(target_pos=timed.loss.target_pos), weight)


def _select_interacting_pair(pack, state, angle_diff_max_th: float,
                             dist_min: float = 10.0, dist_max: float = 30.0,
                             min_current_speed: float = 2.0,
                             sort_by_distance: bool = True,
                             dt: float = 0.1):
    """The reference's adversarial pair picker (`heuristic_gptcollision`,
    `scene_edit_utils.py:584-680`): among same-scene agents that are moving
    now, find pairs whose headings roughly agree and whose separation sits
    in [dist_min, dist_max] both now and ~2s into the GT future; return
    (behind_agent, ahead_agent) of the best pair, or None."""
    # the reference evaluates the pair filters at GT frame t0+20 (2 s at
    # the nuScenes 0.1 s step, `scene_edit_utils.py:631-633`
    # `yaw_diff[:,:,20]`, index 0 = current frame). fut[:, k] is the state
    # AFTER k+1 steps, so the 2 s frame is k = round(2/dt) - 1.
    frames = min(int(round(2.0 / dt)), pack.replay_actions.shape[1])
    fut = _replay_future_states(pack, state, max(frames, 1), dt=dt)
    s = np.asarray(state.states)
    pos0, yaw0, speed0 = s[:, :2], s[:, 3], np.abs(s[:, 2])
    k = frames - 1
    posk, yawk = fut[:, k, :2], fut[:, k, 3]
    scene = np.asarray(pack.scene_index)

    def pair_ok(p, y):
        yd = np.abs(y[:, None] - y[None])
        pd = np.linalg.norm(p[:, None] - p[None], axis=-1)
        return (yd < angle_diff_max_th) & (pd > dist_min) & (pd < dist_max), pd

    ok0, _ = pair_ok(pos0, yaw0)
    okk, pdk = pair_ok(posk, yawk)
    moving = speed0 > min_current_speed
    valid = (
        ok0 & okk
        & moving[:, None] & moving[None]
        & (scene[:, None] == scene[None])
    )
    np.fill_diagonal(valid, False)
    if not valid.any():
        return None
    idx = np.argwhere(valid)
    if sort_by_distance:
        idx = idx[np.argsort(pdk[valid])]
    i, j = int(idx[0, 0]), int(idx[0, 1])
    # order (behind, ahead): is j ahead of i in i's frame?
    rel = pos0[j] - pos0[i]
    ahead = rel[0] * np.cos(yaw0[i]) + rel[1] * np.sin(yaw0[i]) > 0
    return (i, j) if ahead else (j, i)


def heuristic_gptcollision(pack, state, collision_radius: float = 1.0,
                           weight: float = 5.0, dt: float = 0.1, **_host_only):
    """Adversarial collision between an auto-selected pair
    (`heuristic_gptcollision`, `scene_edit_utils.py:584-680`): the behind
    agent attacks the agent ahead of it. `collision_radius` is part of the
    reference's GPT-generated loss; the cld_tpu CollisionAttackLoss
    minimizes the pair min-distance directly, so the radius only gates the
    reference's success metric, not the gradient — accepted and unused."""
    pair = _select_interacting_pair(pack, state, angle_diff_max_th=0.4 * np.pi,
                                    sort_by_distance=True, dt=dt)
    if pair is None:
        return None
    return heuristic_collision_attack(pair[0], pair[1], weight=weight)


def heuristic_gptkeepdistance(pack, state, min_distance: float = 5.0,
                              max_distance: float = 15.0,
                              weight: float = 2.0, dt: float = 0.1,
                              **_host_only):
    """Keep-distance between an auto-selected pair
    (`heuristic_gptkeepdistance`, `scene_edit_utils.py:682-780`)."""
    pair = _select_interacting_pair(pack, state, angle_diff_max_th=0.2 * np.pi,
                                    sort_by_distance=False, dt=dt)
    if pair is None:
        return None
    return heuristic_keep_distance(pair[0], pair[1], min_dist=min_distance,
                                   max_dist=max_distance, weight=weight)


HEURISTIC_MAP = {
    "target_speed": heuristic_target_speed,
    "agent_collision": lambda pack, state, **kw: heuristic_agent_collision(pack=pack, **kw),
    "map_collision": lambda pack, state, **kw: heuristic_map_collision(**kw),
    "speed_limit": heuristic_speed_limit,
    "lane_following": heuristic_lane_following,
    "global_target_pos": heuristic_global_target_pos,
    "stop_sign": heuristic_stop_sign,
    "social_group": heuristic_social_group,
    "target_pos": heuristic_target_pos,
    "target_pos_at_time": heuristic_target_pos_at_time,
    "global_target_pos_at_time": heuristic_global_target_pos_at_time,
    "global_stop_sign": heuristic_global_stop_sign,
    "gptcollision": heuristic_gptcollision,
    "gptkeepdistance": heuristic_gptkeepdistance,
}


def compute_heuristic_guidance(names: Sequence[str], pack, state,
                               dt: float = 0.1) -> List[GuidanceSpec]:
    """Build specs for the requested heuristics
    (`compute_heuristic_guidance`, `scene_edit_utils.py:809-907`). Builders
    may emit one spec or a list (social_group emits one per group). `dt` is
    the sim step time (SimConfig.dt) — it converts the reference's
    seconds-denominated knobs (fut_sec, the 2 s gpt-pair window) to frames
    and scales the GT-future replay roll."""
    specs: List[GuidanceSpec] = []
    for n in names:
        built = HEURISTIC_MAP[n](pack, state, dt=dt)
        if built is None:
            continue
        specs.extend(built if isinstance(built, list) else [built])
    return specs


# -- reference-config translation shim ---------------------------------------

# reference param spelling -> cld_tpu builder kwarg, per heuristic name.
# Spellings come from the signatures at scene_edit_utils.py:230-705; params
# not listed pass through unchanged (they already share the name).
_REF_PARAM_RENAMES = {
    "agent_collision": {},  # num_disks, buffer_dist, decay_rate match
    "map_collision": {},  # num_points_lw, decay_rate match
}
# reference knobs with no on-device meaning, accepted and dropped:
# `action_num` (candidate actions for filtration) is rollout's
# --num-action-samples; `target_tolerance` on the UNtimed
# global_target_pos has no analog in GlobalTargetPosLoss (only the timed
# variant uses it); `scale`/`horizon_length` are only meaningful for the
# stop-sign losses (passed through there). `dt` is NOT dropped — a config
# that names it overrides the sim-config default.
_REF_DROP_PARAMS = {
    "global_target_pos": ("action_num", "target_tolerance"),
    "global_target_pos_at_time": ("action_num",),
    "global_stop_sign": (),
    # action_num only feeds the global variant's cross-replan latch; the
    # local rule has no latch (reference passes already_stopped=zeros)
    "stop_sign": ("action_num",),
    "speed_limit": (),
    "target_speed": (),
    "gptcollision": (),
    "gptkeepdistance": (),
}


def heuristics_from_configs(configs: Sequence[dict], pack, state,
                            dt: float = 0.1) -> List[GuidanceSpec]:
    """Build specs from REFERENCE-format heuristic configs: a list of
    `{"name", "weight", "params"}` dicts with the reference's param
    spellings (`compute_heuristic_guidance`, `scene_edit_utils.py:806-833`)
    — so heuristic config files written for the reference run unmodified.

    `params.excluded_agents` (agent_collision only) carries the reference
    AgentCollisionLoss semantics: collisions among that set are
    un-penalized, excluded-vs-included pairs still count. A config `dt`
    overrides the sim-config `dt`; host-only knobs are dropped per
    _REF_DROP_PARAMS."""
    specs: List[GuidanceSpec] = []
    for cfg in configs:
        missing = {"name", "weight", "params"} - set(cfg)
        if missing:
            raise ValueError(f"heuristic config missing fields {sorted(missing)}: {cfg}")
        name = cfg["name"]
        if name not in HEURISTIC_MAP:
            raise KeyError(
                f"unknown heuristic {name!r}; known: {sorted(HEURISTIC_MAP)}"
            )
        params = dict(cfg["params"])
        cfg_dt = params.pop("dt", None)
        excluded = params.pop("excluded_agents", None)
        if excluded is not None:
            if name != "agent_collision":
                raise ValueError(
                    f"excluded_agents is only meaningful for agent_collision "
                    f"(reference guidance_loss.py:447-464); got it on {name!r}"
                )
            params["excluded_agents"] = tuple(int(i) for i in excluded)
        for k in _REF_DROP_PARAMS.get(name, ()):
            params.pop(k, None)
        renames = _REF_PARAM_RENAMES.get(name, {})
        params = {renames.get(k, k): v for k, v in params.items()}
        built = HEURISTIC_MAP[name](
            pack, state, weight=cfg["weight"],
            dt=float(cfg_dt) if cfg_dt is not None else dt, **params,
        )
        if built is None:
            continue
        specs.extend(built if isinstance(built, list) else [built])
    return specs
