"""On-device closed-loop simulator.

Re-design of `EnvUnifiedSimulation`
(`/root/reference/src/tbsim/envs/env_trajdata.py:28-519`) + the rollout loop
(`rollout.py:95-100`, `scene_edit_utils.py:15-160`): the reference
alternates host-side trajdata scene stepping / numpy observation collation
with GPU policy inference every frame; here the entire receding-horizon
rollout — observation rendering (map warp + history rasterization), policy
sampling, kinematic stepping, and metric accumulation — is one `lax.scan`
over replan rounds, executed on device with zero host round-trips. This is
where the reference's dominant closed-loop wall-clock cost disappears
(SURVEY.md §7 "Host-free closed loop").

Replan cadence mirrors the config of record: the policy plans `horizon=52`
steps and the simulator consumes `n_step_action=5` per replan over
`num_simulation_steps=100` frames (`scene_edit_config.py:122-123`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_step, unicycle_ubound
from cld_tpu.ops.geometry import (
    agent_from_world_matrix,
    obb_collision_matrix,
    raster_from_agent_matrix,
    transform_points,
    world_from_agent_matrix,
)
from cld_tpu.ops.raster import rasterize_history, warp_scene_maps
from cld_tpu.sim.scene import ScenePack


@dataclasses.dataclass(frozen=True)
class SimConfig:
    num_simulation_steps: int = 100
    n_step_action: int = 5
    hist_frames: int = 30
    raster_size: int = 224
    pixel_size: float = 0.5
    ego_center: Tuple[float, float] = (-0.5, 0.0)
    dt: float = 0.1
    # planning horizon the observation's GT-future (target_*) channels
    # cover — must match the policy's algo.horizon (config of record: 52)
    plan_horizon: int = 52
    # extent scale on the exact oriented-box overlap test
    # (ops/geometry.py:obb_collision_matrix — the vectorized equivalent of
    # the reference's shapely `detect_collision`, geometry_utils.py:339-400).
    # 1.0 = geometric intersection parity; >1 adds a safety margin. NOT the
    # PPO reward's absolute 0.8 m disk threshold (algos/reward.py).
    collision_thresh: float = 1.0
    dyn: UnicycleParams = UnicycleParams(
        max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0, acce_hi=8.0
    )

    @property
    def num_replans(self) -> int:
        if self.num_simulation_steps % self.n_step_action:
            raise ValueError(
                f"num_simulation_steps={self.num_simulation_steps} must be a "
                f"multiple of n_step_action={self.n_step_action} — a floor "
                "division would silently simulate fewer frames than asked"
            )
        return self.num_simulation_steps // self.n_step_action


class SimState(NamedTuple):
    states: jnp.ndarray  # [Na, 4] world (x, y, v, yaw)
    history: jnp.ndarray  # [Na, Th, 4] world-frame state history (newest last)
    step: jnp.ndarray  # scalar int32 global frame index
    offroad_steps: jnp.ndarray  # [Na] accumulated offroad frames
    collision_steps: jnp.ndarray  # [Na] accumulated in-collision frames
    # [Na, 3] in-collision frames by CollisionType (front, rear, side) —
    # the reference's typed collision rates (`env_metrics.py:391-489` over
    # `CollisionType`, `geometry_utils.py:331-400`); classified on device
    # by the nearest colliding partner's bearing in the agent frame
    collision_type_steps: jnp.ndarray
    max_abs_acc: jnp.ndarray  # [Na] comfort accumulators
    max_abs_yawvel: jnp.ndarray  # [Na]


def init_sim_state(pack: ScenePack, cfg: SimConfig) -> SimState:
    Na = pack.num_agents
    Th = cfg.hist_frames + 1
    # pre-roll history: constant-velocity extrapolation backwards
    steps_back = jnp.arange(Th - 1, -1, -1, dtype=jnp.float32)
    dx = pack.init_states[:, 2:3] * cfg.dt * steps_back[None]  # [Na, Th]
    hx = pack.init_states[:, 0:1] - dx * jnp.cos(pack.init_states[:, 3:4])
    hy = pack.init_states[:, 1:2] - dx * jnp.sin(pack.init_states[:, 3:4])
    hist = jnp.stack(
        [
            hx,
            hy,
            jnp.broadcast_to(pack.init_states[:, 2:3], hx.shape),
            jnp.broadcast_to(pack.init_states[:, 3:4], hx.shape),
        ],
        axis=-1,
    )
    return SimState(
        states=pack.init_states,
        history=hist,
        step=jnp.zeros((), jnp.int32),
        offroad_steps=jnp.zeros((Na,)),
        collision_steps=jnp.zeros((Na,)),
        collision_type_steps=jnp.zeros((Na, 3)),
        max_abs_acc=jnp.zeros((Na,)),
        max_abs_yawvel=jnp.zeros((Na,)),
    )


def drivable_at_world(pack: ScenePack, pos: jnp.ndarray) -> jnp.ndarray:
    """pos [..., Na, 2] world -> drivable {0,1} from each agent's scene map
    (leading batch dims broadcast; the single source of the world-map
    origin/round/clip/channel-0 lookup convention — the sim scan and the
    CLE offroad validator both use it)."""
    origin = pack.map_origin[pack.scene_index]  # [Na, 2]
    wp = (pos - origin) / pack.map_resolution
    Hw, Ww = pack.world_map.shape[1:3]
    ix = jnp.clip(jnp.round(wp[..., 0]).astype(jnp.int32), 0, Ww - 1)
    iy = jnp.clip(jnp.round(wp[..., 1]).astype(jnp.int32), 0, Hw - 1)
    return pack.world_map[pack.scene_index, iy, ix, 0]


def render_observation(
    pack: ScenePack, state: SimState, cfg: SimConfig, world_q8=None
) -> TrafficBatch:
    """World state -> agent-centric TrafficBatch (the on-device equivalent of
    `EnvUnifiedSimulation.get_observation`, `env_trajdata.py:314-369`)."""
    Na = pack.num_agents
    pos = state.states[:, :2]
    yaw = state.states[:, 3]
    w_from_a = world_from_agent_matrix(pos, yaw)
    a_from_w = agent_from_world_matrix(pos, yaw)

    # semantic layers: per-agent egocentric warp of that agent's scene map
    # (banded one-hot MXU gather on TPU — the XLA fancy-index warp was 40%
    # of a guided closed-loop episode, scripts/closed_loop_breakdown.py)
    sem = warp_scene_maps(
        pack.world_map,
        pack.map_origin,
        pack.map_resolution,
        w_from_a,
        pack.scene_index,
        cfg.raster_size,
        cfg.pixel_size,
        cfg.ego_center,
        world_maps_q8=world_q8,
    )  # [Na, H, W, C_sem]

    # histories into each agent's frame
    hist_world = state.history[:, :, :2]  # [Na, Th, 2]
    ego_hist = transform_points(hist_world, a_from_w)
    # neighbors: all agents in the same scene (self included then masked)
    all_hist = jnp.broadcast_to(hist_world[None], (Na,) + hist_world.shape)  # [Na, Na, Th, 2]
    neigh_hist = transform_points(
        all_hist.reshape(Na, -1, 2), a_from_w
    ).reshape(Na, Na, -1, 2)
    same_scene = pack.scene_index[:, None] == pack.scene_index[None, :]
    neigh_mask = same_scene & ~jnp.eye(Na, dtype=bool)  # [Na, Na]
    Th = hist_world.shape[1]
    neigh_avail = jnp.broadcast_to(neigh_mask[:, :, None], (Na, Na, Th)).astype(jnp.float32)
    ego_avail = jnp.ones((Na, Th))

    rfa = jnp.broadcast_to(
        jnp.asarray(raster_from_agent_matrix(cfg.raster_size, cfg.pixel_size, cfg.ego_center)),
        (Na, 3, 3),
    )
    hist_img = rasterize_history(ego_hist, ego_avail, neigh_hist, neigh_avail, rfa, cfg.raster_size)
    image = jnp.concatenate([hist_img.transpose(0, 2, 3, 1), sem], axis=-1)  # NHWC

    # ego history yaw in agent frame
    hist_yaw_agent = state.history[:, :, 3:4] - yaw[:, None, None]

    # dataset future (GT) in the agent frame — the reference's observation
    # carries the scene's remaining GT trajectory (`env_trajdata.py:314-369`
    # via parse_trajdata_batch target_*); consumed by guide_with_gt sample
    # selection and eval metrics
    T_plan = cfg.plan_horizon
    if pack.gt_states is not None:
        gt_pad = jnp.pad(pack.gt_states, ((0, 0), (0, T_plan), (0, 0)))
        av_pad = jnp.pad(
            pack.gt_avail.astype(jnp.float32), ((0, 0), (0, T_plan))
        )
        fut = jax.lax.dynamic_slice_in_dim(gt_pad, state.step + 1, T_plan, axis=1)
        fut_av = jax.lax.dynamic_slice_in_dim(av_pad, state.step + 1, T_plan, axis=1)
        tgt_pos = transform_points(fut[..., :2], a_from_w)
        tgt_yaw = fut[..., 3:4] - yaw[:, None, None]
        tgt_av = fut_av
    else:
        tgt_pos = jnp.zeros((Na, T_plan, 2))
        tgt_yaw = jnp.zeros((Na, T_plan, 1))
        tgt_av = jnp.zeros((Na, T_plan))

    # neighbor history in each agent's frame — consumed by the planner
    # policies' constant-velocity predictors (policies/mpc.py) exactly as
    # the reference's observation dict carries all_other_agents_history_*
    neigh_yaw = (
        jnp.broadcast_to(state.history[:, :, 3][None], (Na, Na, Th))
        - yaw[:, None, None]
    )

    # closest lane points in the agent frame — the closed-loop analogue of
    # the reference's extras["closest_lane_point"] (configs/datamodules.py:
    # 53-59); consumed by the MPC's lane-tracking reference and the
    # lane_following guidance rule
    lane_pts = lane_av = None
    if pack.lane_points is not None:
        from cld_tpu.ops.lanes import closest_lane_points

        lane_pts, lane_av = closest_lane_points(
            pack.lane_points[pack.scene_index],
            pack.lane_avail[pack.scene_index],
            pos, yaw, a_from_w,
        )

    return TrafficBatch(
        image=image,
        drivable_map=sem[..., 0],
        raster_from_agent=rfa,
        history_positions=ego_hist,
        history_yaws=hist_yaw_agent,
        history_availabilities=ego_avail,
        curr_speed=state.states[:, 2],
        target_positions=tgt_pos,
        target_yaws=tgt_yaw,
        target_availabilities=tgt_av,
        extent=pack.extent,
        all_other_agents_future_positions=jnp.zeros((Na, 1, T_plan, 2)),
        all_other_agents_future_availability=jnp.zeros((Na, 1, T_plan)),
        all_other_agents_history_positions=neigh_hist,
        all_other_agents_history_yaws=neigh_yaw[..., None],
        all_other_agents_history_availability=neigh_avail,
        world_from_agent=w_from_a,
        agent_from_world=a_from_w,
        scene_index=pack.scene_index,
        history_speeds=state.history[:, :, 2],
        sim_step=state.step,
        lane_points=lane_pts,
        lane_avail=lane_av,
    )


PolicyFn = Callable[[TrafficBatch, jax.Array], jnp.ndarray]
# (obs, rng) -> actions [Na, T_plan, 2] (acc, yawvel), descaled


def _consume_actions(
    pack: ScenePack, state: SimState, actions: jnp.ndarray, cfg: SimConfig
) -> Tuple[SimState, jnp.ndarray]:
    """Advance n_step_action frames (`EnvUnifiedSimulation._step`,
    `env_trajdata.py:400-478`), with per-frame metric accumulation
    (`_add_per_step_metrics`, `:371-398`). Returns the advanced state and
    the per-frame world-state log [n_step_action, Na, 4]."""

    def frame(carry, k):
        st = carry
        u_policy = actions[:, k]
        u_replay = jax.lax.dynamic_slice_in_dim(
            pack.replay_actions, st.step, 1, axis=1
        )[:, 0]
        u = jnp.where(pack.controlled_mask[:, None], u_policy, u_replay)
        # invalid-action guard (`env_trajdata.py:463-468`): NaN controls
        # freeze the agent instead of corrupting the world state
        u = jnp.where(jnp.isfinite(u), u, 0.0)
        # clip to the dynamics bounds HERE so the comfort accumulators see
        # the control the simulator actually executes, not the raw command
        lb, ub = unicycle_ubound(cfg.dyn, st.states)
        u = jnp.clip(u, jax.lax.stop_gradient(lb), jax.lax.stop_gradient(ub))
        new_states = unicycle_step(cfg.dyn, st.states, u, cfg.dt, bound=False)

        # metrics
        drivable = drivable_at_world(pack, new_states[:, :2])
        offroad = (drivable <= 0).astype(jnp.float32)
        pos = new_states[:, :2]
        dist = jnp.linalg.norm(pos[:, None] - pos[None], axis=-1)
        same_scene = pack.scene_index[:, None] == pack.scene_index[None, :]
        valid_pair = same_scene & ~jnp.eye(pack.num_agents, dtype=bool)
        # exact oriented-box overlap (the reference's shapely intersection,
        # vectorized via SAT) — a center-distance disk test over-reports
        # SIDE collisions for parallel adjacent-lane traffic
        coll_pair = obb_collision_matrix(
            pos, new_states[:, 3], pack.extent[:, :2],
            extent_scale=cfg.collision_thresh,
        ) & valid_pair
        colliding = jnp.any(coll_pair, axis=-1)

        # CollisionType classification (`geometry_utils.py:331-400` via
        # shapely side intersections, here the TPU-native bearing test):
        # the nearest colliding partner's offset in the agent frame,
        # extent-normalized — longitudinal-dominant ahead = FRONT, behind =
        # REAR, lateral-dominant = SIDE
        yaw_i = new_states[:, 3]
        rel = pos[None, :, :] - pos[:, None, :]  # [i, j, 2]
        c_i, s_i = jnp.cos(yaw_i)[:, None], jnp.sin(yaw_i)[:, None]
        dx = c_i * rel[..., 0] + s_i * rel[..., 1]  # [i, j] longitudinal
        dy = -s_i * rel[..., 0] + c_i * rel[..., 1]  # lateral
        nearest = jnp.argmin(jnp.where(coll_pair, dist, jnp.inf), axis=-1)  # [Na]
        ar = jnp.arange(pack.num_agents)
        lon_n = dx[ar, nearest] / jnp.maximum(pack.extent[:, 0], 1e-3)
        lat_n = dy[ar, nearest] / jnp.maximum(pack.extent[:, 1], 1e-3)
        longitudinal = jnp.abs(lon_n) >= jnp.abs(lat_n)
        ctype = jnp.stack(
            [
                colliding & longitudinal & (lon_n >= 0),  # FRONT
                colliding & longitudinal & (lon_n < 0),  # REAR
                colliding & ~longitudinal,  # SIDE
            ],
            axis=-1,
        ).astype(jnp.float32)

        history = jnp.concatenate([st.history[:, 1:], new_states[:, None]], axis=1)
        return (
            SimState(
                states=new_states,
                history=history,
                step=st.step + 1,
                offroad_steps=st.offroad_steps + offroad,
                collision_steps=st.collision_steps + colliding.astype(jnp.float32),
                collision_type_steps=st.collision_type_steps + ctype,
                max_abs_acc=jnp.maximum(st.max_abs_acc, jnp.abs(u[:, 0])),
                max_abs_yawvel=jnp.maximum(st.max_abs_yawvel, jnp.abs(u[:, 1])),
            ),
            new_states,
        )

    state, frames = jax.lax.scan(frame, state, jnp.arange(cfg.n_step_action))
    return state, frames  # frames: [n_step_action, Na, 4]


def simulate(
    pack: ScenePack,
    policy_fn: PolicyFn,
    rng: jax.Array,
    cfg: SimConfig = SimConfig(),
) -> Tuple[SimState, jnp.ndarray]:
    """Full receding-horizon rollout as one scan over replan rounds.

    Returns (final SimState, trajectory log [T_sim, Na, 4] world frame).
    """
    state = init_sim_state(pack, cfg)
    replan_rngs = jax.random.split(rng, cfg.num_replans)
    # quantize the world maps ONCE outside the replan scan — XLA does not
    # hoist the pass out of the loop (same class as prepack_drivable), so
    # inlining it in render_observation would re-run it every replan
    from cld_tpu.ops.raster import quantize_world_maps_q8

    world_q8 = quantize_world_maps_q8(pack.world_map)

    def replan(state, step_rng):
        obs = render_observation(pack, state, cfg, world_q8=world_q8)
        actions = policy_fn(obs, step_rng)
        # policies may return an Action container (cld_tpu.policies) or a
        # raw [Na, T, 2] (acc, yawvel) array
        if hasattr(actions, "controls"):
            actions = actions.controls
        state, frames = _consume_actions(pack, state, actions, cfg)
        return state, frames

    state, frames = jax.lax.scan(replan, state, replan_rngs)
    # [num_replans, n_step_action, Na, 4] -> [T_sim, Na, 4]
    traj = frames.reshape(-1, pack.num_agents, 4)
    return state, traj
