"""ScenePack: the device-resident world used by the closed-loop simulator.

Replaces the reference's host-side trajdata `SimulationScene` list
(`/root/reference/src/tbsim/envs/env_trajdata.py:28-519`): instead of
re-collating observations per frame on CPU, the whole world — semantic
rasters, agent states, replay trajectories — lives in device arrays with
static shapes, and observation rendering is a gather (see cld_tpu.ops.raster).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
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

    @property
    def num_agents(self) -> int:
        return self.init_states.shape[0]


def synthetic_scene_pack(
    seed: int = 0,
    num_scenes: int = 1,
    agents_per_scene: int = 4,
    world_map_size: int = 512,
    map_resolution: float = 0.5,
    num_sem_layers: int = 3,
    sim_steps: int = 100,
    road_half_width: float = 7.0,
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

    return ScenePack(
        world_map=jnp.asarray(world_map),
        map_origin=jnp.asarray(np.broadcast_to(origin, (Ns, 2)).copy()),
        map_resolution=float(map_resolution),
        init_states=jnp.asarray(init_states),
        scene_index=jnp.asarray(scene_index),
        controlled_mask=jnp.asarray(controlled),
        replay_actions=jnp.asarray(replay_actions),
        extent=jnp.asarray(extent),
    )
