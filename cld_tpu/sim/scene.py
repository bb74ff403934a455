"""ScenePack: the device-resident world used by the closed-loop simulator.

Replaces the reference's host-side trajdata `SimulationScene` list
(`/root/reference/src/tbsim/envs/env_trajdata.py:28-519`): instead of
re-collating observations per frame on CPU, the whole world — semantic
rasters, agent states, replay trajectories — lives in device arrays with
static shapes, and observation rendering is a gather (see cld_tpu.ops.raster).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class ScenePack(NamedTuple):
    """Static world description for a batch of scenes.

    Na agents across Ns scenes; every array is padded/dense.
    """

    world_map: jnp.ndarray  # [Ns, Hw, Ww, C_sem] world-frame semantic raster
    map_origin: jnp.ndarray  # [Ns, 2] world coords of map pixel (0,0)
    map_resolution: float  # meters / world-map pixel (static)
    init_states: jnp.ndarray  # [Na, 4] world (x, y, v, yaw)
    scene_index: jnp.ndarray  # [Na] int
    controlled_mask: jnp.ndarray  # [Na] bool: policy-controlled vs replay
    replay_actions: jnp.ndarray  # [Na, T_sim, 2] (acc, yawvel) for replay agents
    extent: jnp.ndarray  # [Na, 3]
    # lane centerlines: world-frame (x, y, yaw) points per scene, masked —
    # the dense analogue of trajdata's VectorMap lane centers consumed by
    # the closest-lane machinery (ops/lanes.py; ref trajdata_utils.py:882-1019)
    lane_points: Optional[jnp.ndarray] = None  # [Ns, L, 3]
    lane_avail: Optional[jnp.ndarray] = None  # [Ns, L] bool
    # dataset ("ground-truth") world states under the replay actions, frame
    # 0 = init: [Na, T_sim+1, 4]. Feeds the observation's target_* channels
    # (the reference's obs carries the scene's GT future,
    # `env_trajdata.py:314-369`) and `--guide-with-gt` sample selection
    # (`choose_action_from_gt`, guidance_loss.py:67-100).
    gt_states: Optional[jnp.ndarray] = None
    gt_avail: Optional[jnp.ndarray] = None  # [Na, T_sim+1] bool

    @property
    def num_agents(self) -> int:
        return self.init_states.shape[0]


def _roll_gt_states(
    init_states: np.ndarray, replay_actions: np.ndarray, dt: float = 0.1,
    dyn=None,
) -> np.ndarray:
    """Integrate the replay actions through the bounded unicycle to get the
    dataset future in world frame: [Na, T_sim+1, 4], frame 0 = init. `dyn`
    must carry the SAME action bounds the simulator will step with
    (SimConfig.dyn) so replayed agents' GT matches what the sim executes
    for them; the default mirrors SimConfig's default."""
    from cld_tpu.ops.dynamics import UnicycleParams, unicycle_step

    if dyn is None:
        dyn = UnicycleParams(
            max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0,
            acce_hi=8.0,
        )
    x = jnp.asarray(init_states)
    u = jnp.asarray(replay_actions)

    def step(x, u_t):
        nxt = unicycle_step(dyn, x, u_t, dt, bound=True)
        return nxt, nxt

    _, traj = jax.lax.scan(step, x, jnp.swapaxes(u, 0, 1))
    return np.asarray(
        jnp.concatenate([x[:, None], jnp.swapaxes(traj, 0, 1)], axis=1)
    )


def synthetic_scene_pack(
    seed: int = 0,
    num_scenes: int = 1,
    agents_per_scene: int = 4,
    world_map_size: int = 512,
    map_resolution: float = 0.5,
    num_sem_layers: int = 3,
    sim_steps: int = 100,
    road_half_width: float = 7.0,
    dyn=None,
) -> ScenePack:
    """Straight-road world: drivable band along x centered at y=0, agents
    spawned in lanes driving +x. The closed-loop test artefact (the l5kit
    tests/artefacts pattern, SURVEY.md §4)."""
    rng = np.random.default_rng(seed)
    Ns, A = num_scenes, agents_per_scene
    Na = Ns * A
    Hw = Ww = world_map_size

    # world map centered on origin
    origin = np.array([-Ww * map_resolution / 2, -Hw * map_resolution / 2], np.float32)
    ys = origin[1] + np.arange(Hw, dtype=np.float32) * map_resolution
    drivable_row = (np.abs(ys) < road_half_width).astype(np.float32)
    world_map = np.zeros((Ns, Hw, Ww, num_sem_layers), np.float32)
    world_map[..., 0] = drivable_row[None, :, None]
    if num_sem_layers > 1:
        world_map[..., 1] = 0.5 * world_map[..., 0]
    if num_sem_layers > 2:
        lane_rows = (np.abs(np.abs(ys) - road_half_width / 2) < map_resolution).astype(np.float32)
        world_map[..., 2] = lane_rows[None, :, None]

    lanes = np.array([-road_half_width / 2, road_half_width / 2], np.float32)
    init_states = np.zeros((Na, 4), np.float32)
    init_states[:, 0] = rng.uniform(-80, -20, Na)  # stagger along the road
    init_states[:, 1] = lanes[rng.integers(0, 2, Na)] + rng.uniform(-0.5, 0.5, Na)
    init_states[:, 2] = rng.uniform(3.0, 10.0, Na)
    init_states[:, 3] = 0.0

    scene_index = np.repeat(np.arange(Ns, dtype=np.int32), A)
    controlled = np.zeros(Na, bool)
    controlled[::2] = True  # half controlled, half replay

    # replay agents: mild speed tracking, zero yaw rate
    replay_actions = np.zeros((Na, sim_steps, 2), np.float32)
    replay_actions[:, :, 0] = rng.normal(0, 0.2, (Na, sim_steps))

    extent = np.broadcast_to(np.array([4.5, 2.0, 1.7], np.float32), (Na, 3)).copy()

    # lane centerlines matching the painted lane raster layer
    from cld_tpu.ops.lanes import straight_lane_polylines

    lane_pts, lane_avail = straight_lane_polylines(
        lanes, x_min=origin[0], x_max=origin[0] + Ww * map_resolution
    )

    return ScenePack(
        world_map=jnp.asarray(world_map),
        map_origin=jnp.asarray(np.broadcast_to(origin, (Ns, 2)).copy()),
        map_resolution=float(map_resolution),
        init_states=jnp.asarray(init_states),
        scene_index=jnp.asarray(scene_index),
        controlled_mask=jnp.asarray(controlled),
        replay_actions=jnp.asarray(replay_actions),
        extent=jnp.asarray(extent),
        lane_points=jnp.asarray(np.broadcast_to(lane_pts, (Ns,) + lane_pts.shape).copy()),
        lane_avail=jnp.asarray(np.broadcast_to(lane_avail, (Ns,) + lane_avail.shape).copy()),
        gt_states=jnp.asarray(_roll_gt_states(init_states, replay_actions, dyn=dyn)),
        gt_avail=jnp.ones((Na, sim_steps + 1), bool),
    )


def _default_world_placement(B, scene_index, road_half_width=7.0, seed=0):
    """Synthesize world poses for agent-centric samples that carry none:
    adjacent lanes with longitudinal stagger per scene (the placement the
    reference gets for free from the dataset's world frames)."""
    rng = np.random.default_rng(seed)
    w = np.zeros((B, 3, 3), np.float32)
    lanes = np.array([-road_half_width / 2, road_half_width / 2], np.float32)
    for s in np.unique(scene_index):
        members = np.nonzero(scene_index == s)[0]
        for k, b in enumerate(members):
            x = -80.0 + 15.0 * k + rng.uniform(-2, 2)
            y = lanes[k % 2] + rng.uniform(-0.5, 0.5)
            w[b] = np.array([[1, 0, x], [0, 1, y], [0, 0, 1]], np.float32)
    return w


def _stitch_world_map(
    sem_rasters: np.ndarray,  # [B, H, W, C] agent-frame semantic layers
    raster_from_agent: np.ndarray,  # [B, 3, 3]
    world_from_agent: np.ndarray,  # [B, 3, 3]
    scene_index: np.ndarray,  # [B]
    world_map_size: int,
    map_resolution: float,
) -> tuple:
    """Inverse-warp each agent's egocentric semantic raster into a shared
    world grid per scene, max-combining overlaps. This reconstructs the
    world map the reference keeps in trajdata's VectorMap/raster cache
    (`env_trajdata.py:154-231` reset-from-dataset); for converted real data
    the agent rasters are crops of one underlying map, so the union is
    exact wherever any agent saw the map.
    """
    B, H, W, C = sem_rasters.shape
    scenes = np.unique(scene_index)
    Ns = len(scenes)
    Hw = Ww = world_map_size

    # world grid centered on each scene's agent centroid
    world_map = np.zeros((Ns, Hw, Ww, C), np.float32)
    origins = np.zeros((Ns, 2), np.float32)
    # agent-frame coords of every world pixel: p_a = A_from_W @ p_w
    for si, s in enumerate(scenes):
        members = np.nonzero(scene_index == s)[0]
        centroid = world_from_agent[members, :2, 2].mean(axis=0)
        origin = centroid - np.array([Ww, Hw], np.float32) * map_resolution / 2
        origins[si] = origin
        xs = origin[0] + (np.arange(Ww, dtype=np.float32) + 0.5) * map_resolution
        ys = origin[1] + (np.arange(Hw, dtype=np.float32) + 0.5) * map_resolution
        gx, gy = np.meshgrid(xs, ys)  # [Hw, Ww]
        pw = np.stack([gx, gy, np.ones_like(gx)], axis=-1).reshape(-1, 3)  # [P, 3]
        for b in members:
            r_from_w = raster_from_agent[b] @ np.linalg.inv(world_from_agent[b])
            pr = pw @ r_from_w.T  # [P, 3] raster coords
            col = np.round(pr[:, 0]).astype(np.int64)
            row = np.round(pr[:, 1]).astype(np.int64)
            valid = (col >= 0) & (col < W) & (row >= 0) & (row < H)
            vals = np.zeros((pw.shape[0], C), np.float32)
            vals[valid] = sem_rasters[b, row[valid], col[valid]]
            world_map[si] = np.maximum(world_map[si], vals.reshape(Hw, Ww, C))
    return world_map, origins, scenes


def scene_pack_from_batches(
    batch,
    scene_index: Optional[np.ndarray] = None,
    world_from_agent: Optional[np.ndarray] = None,
    sim_steps: int = 100,
    world_map_size: int = 512,
    map_resolution: float = 0.5,
    controlled_mask: Optional[np.ndarray] = None,
    num_hist_channels: Optional[int] = None,
    dt: float = 0.1,
    seed: int = 0,
    dyn=None,
) -> ScenePack:
    """Build a simulatable world from a TrafficBatch of converted scenes —
    the on-device equivalent of `EnvUnifiedSimulation.reset`
    (`/root/reference/src/tbsim/envs/env_trajdata.py:154-231`):

    * world map: per-scene stitch of the agents' egocentric semantic rasters
      (exact for real converted data, see _stitch_world_map);
    * init states: each agent's world pose + current speed;
    * replay actions: inverse unicycle dynamics on the GT future
      (`convert_state_to_state_and_action`, diffuser_helpers.py:685-749),
      zero-padded past the GT horizon — so uncontrolled agents replay the
      dataset exactly as the reference's non-simulated agents do.

    Agent-centric batches without world pose metadata (e.g. synthetic
    shards) get a synthesized lane placement.
    """
    from cld_tpu.ops.dynamics import convert_state_to_state_and_action

    B = int(batch.image.shape[0])
    scene_index = (
        np.asarray(scene_index)
        if scene_index is not None
        else (np.asarray(batch.scene_index) if batch.scene_index is not None
              else np.zeros(B, np.int64))
    )
    if world_from_agent is None:
        if batch.world_from_agent is not None:
            world_from_agent = np.asarray(batch.world_from_agent)
        else:
            world_from_agent = _default_world_placement(B, scene_index, seed=seed)

    # semantic layers are the trailing channels after the history layers
    img = np.asarray(batch.image)
    Th = batch.history_positions.shape[1] if num_hist_channels is None else num_hist_channels
    sem = img[..., Th:]
    world_map, origins, scenes = _stitch_world_map(
        sem, np.asarray(batch.raster_from_agent), world_from_agent,
        scene_index, world_map_size, map_resolution,
    )
    dense_scene = np.searchsorted(scenes, scene_index)

    pos_w = world_from_agent[:, :2, 2]
    yaw_w = np.arctan2(world_from_agent[:, 1, 0], world_from_agent[:, 0, 0])
    init_states = np.stack(
        [pos_w[:, 0], pos_w[:, 1], np.asarray(batch.curr_speed), yaw_w], axis=-1
    ).astype(np.float32)

    # GT replay actions from the agent-frame future via inverse dynamics
    gt = jnp.concatenate(
        [jnp.asarray(batch.target_positions), jnp.asarray(batch.target_yaws)], axis=-1
    )
    sa = convert_state_to_state_and_action(gt, jnp.asarray(batch.curr_speed), dt)
    actions = np.asarray(sa[..., 4:6])  # [B, T_fut, 2]
    avail = np.asarray(batch.target_availabilities) > 0
    actions = np.where(avail[..., None], actions, 0.0)
    T_fut = actions.shape[1]
    replay = np.zeros((B, sim_steps, 2), np.float32)
    replay[:, : min(T_fut, sim_steps)] = actions[:, :sim_steps]

    if controlled_mask is None:
        controlled_mask = np.ones(B, bool)

    # lane centerlines: union of the samples' agent-frame closest-lane-point
    # extras (converter-recorded, mirroring the reference's
    # extras["closest_lane_point"], configs/datamodules.py:53-56), lifted to
    # the world frame and deduped per scene
    Ns = len(scenes)
    if batch.lane_points is not None:
        from cld_tpu.ops.lanes import merge_scene_lanes

        lp = np.asarray(batch.lane_points)  # [B, L0, 3] agent frame
        la = (
            np.asarray(batch.lane_avail) > 0
            if batch.lane_avail is not None
            else np.isfinite(lp).all(-1)
        )
        cos = world_from_agent[:, 0, 0][:, None]
        sin = world_from_agent[:, 1, 0][:, None]
        lp_w = np.stack(
            [
                cos * lp[..., 0] - sin * lp[..., 1] + world_from_agent[:, 0, 2][:, None],
                sin * lp[..., 0] + cos * lp[..., 1] + world_from_agent[:, 1, 2][:, None],
                lp[..., 2] + np.arctan2(world_from_agent[:, 1, 0], world_from_agent[:, 0, 0])[:, None],
            ],
            axis=-1,
        )
        lane_pts, lane_avail = merge_scene_lanes(lp_w, la, dense_scene, Ns)
    else:
        lane_pts = np.zeros((Ns, 256, 3), np.float32)
        lane_avail = np.zeros((Ns, 256), bool)

    return ScenePack(
        world_map=jnp.asarray(world_map),
        map_origin=jnp.asarray(origins),
        map_resolution=float(map_resolution),
        init_states=jnp.asarray(init_states),
        scene_index=jnp.asarray(dense_scene.astype(np.int32)),
        controlled_mask=jnp.asarray(np.asarray(controlled_mask)),
        replay_actions=jnp.asarray(replay),
        extent=jnp.asarray(batch.extent),
        lane_points=jnp.asarray(lane_pts),
        lane_avail=jnp.asarray(lane_avail),
        gt_states=jnp.asarray(_roll_gt_states(init_states, replay, dt=dt, dyn=dyn)),
        # GT is only valid while dataset future actions exist; past the GT
        # horizon the zero-padded replay coasts and is marked unavailable
        gt_avail=jnp.asarray(
            np.concatenate(
                [
                    np.ones((B, 1), bool),
                    (np.arange(sim_steps)[None, :] < avail.sum(-1, keepdims=True)),
                ],
                axis=1,
            )
        ),
    )


def scene_pack_from_shards(
    path: str,
    num_scenes: int = 1,
    agents_per_scene: int = 4,
    sim_steps: int = 100,
    start_index: int = 0,
    controlled_mask: Optional[np.ndarray] = None,
    **kwargs,
) -> ScenePack:
    """Load converted scenes from a packed-shard directory into a ScenePack
    (`rollout.py --scene-data`). Uses the shards' own `scene_index` /
    `world_from_agent` fields when the converter recorded them; otherwise
    groups consecutive samples into scenes of `agents_per_scene`.
    """
    from cld_tpu.data.batch import TrafficBatch
    from cld_tpu.data.packed import PackedShardDataset

    ds = PackedShardDataset(path)
    Na = num_scenes * agents_per_scene
    idx = np.arange(start_index, start_index + Na) % ds.num_samples
    raw = ds.gather(idx)
    ds.close()

    batch_fields = set(TrafficBatch._fields)
    batch = TrafficBatch(
        **{k: jnp.asarray(v) for k, v in raw.items() if k in batch_fields}
    )
    scene_index = raw.get(
        "scene_index",
        np.repeat(np.arange(num_scenes, dtype=np.int64), agents_per_scene),
    )
    world_from_agent = raw.get("world_from_agent")
    return scene_pack_from_batches(
        batch,
        scene_index=np.asarray(scene_index).astype(np.int64).reshape(-1),
        world_from_agent=world_from_agent,
        sim_steps=sim_steps,
        controlled_mask=controlled_mask,
        **kwargs,
    )
