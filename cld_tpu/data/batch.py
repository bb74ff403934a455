"""TrafficBatch — the canonical on-device scene representation.

Replaces the reference's stringly-typed batch dict produced by
`parse_node_centric` (`/root/reference/src/tbsim/utils/trajdata_utils.py:346-475`)
with one fixed-shape NamedTuple pytree. Every field is a dense array with
static shapes (TPU requirement); raggedness is expressed through
availability masks.

Conventions (matching the reference's agent-centric standardized frames):
  * the predicted agent sits at the origin with yaw 0 at the current step;
  * image is channels-last [B, H, W, C] with C = (hist_frames+1) agent-
    history layers (ego +1 / others -1, most recent last) followed by
    num_sem_layers semantic map layers (`trajdata_utils.py:123-156`);
  * drivable_map [B, H, W] is the first semantic layer thresholded
    (`get_drivable_region_map`, `trajdata_utils.py:159-220`);
  * raster_from_agent [B, 3, 3] maps agent-frame meters to pixels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class TrafficBatch(NamedTuple):
    # map raster: [B, H, W, C_hist + C_sem]
    image: jnp.ndarray
    # drivable region: [B, H, W] float {0, 1}
    drivable_map: jnp.ndarray
    # agent-frame -> raster-pixel transform: [B, 3, 3]
    raster_from_agent: jnp.ndarray
    # ego history (agent frame): [B, Th, 2], [B, Th, 1], [B, Th]
    history_positions: jnp.ndarray
    history_yaws: jnp.ndarray
    history_availabilities: jnp.ndarray
    # current speed: [B]
    curr_speed: jnp.ndarray
    # GT future (agent frame): [B, T, 2], [B, T, 1], [B, T]
    target_positions: jnp.ndarray
    target_yaws: jnp.ndarray
    target_availabilities: jnp.ndarray
    # vehicle extent (length, width, height): [B, 3]
    extent: jnp.ndarray
    # neighbors' future (agent frame): [B, S, T, 2], [B, S, T]
    all_other_agents_future_positions: jnp.ndarray
    all_other_agents_future_availability: jnp.ndarray
    # neighbors' history for re-rasterization: [B, S, Th, 2], [B, S, Th, 1], [B, S, Th]
    all_other_agents_history_positions: Optional[jnp.ndarray] = None
    all_other_agents_history_yaws: Optional[jnp.ndarray] = None
    all_other_agents_history_availability: Optional[jnp.ndarray] = None
    # world pose (filled by the simulator's renderer; identity for offline
    # standardized batches): [B, 3, 3], [B, 3, 3], [B]
    world_from_agent: Optional[jnp.ndarray] = None
    agent_from_world: Optional[jnp.ndarray] = None
    scene_index: Optional[jnp.ndarray] = None
    # ego speed history [B, Th] and the global sim frame index (scalar int32)
    # — consumed by the global (world-frame, time-aware) guidance losses
    history_speeds: Optional[jnp.ndarray] = None
    sim_step: Optional[jnp.ndarray] = None
    # closest lane-center points in the agent frame, masked — the canonical
    # form of the reference's extras["closest_lane_point"]
    # (configs/datamodules.py:53-56, trajdata_utils.py:959-1019), flattened
    # from [S_seg, S_point, 3] to one dense point set: [B, L, 3], [B, L]
    lane_points: Optional[jnp.ndarray] = None
    lane_avail: Optional[jnp.ndarray] = None

    @property
    def batch_size(self) -> int:
        return self.image.shape[0]

    @property
    def horizon(self) -> int:
        return self.target_positions.shape[1]


def get_current_states(batch: TrafficBatch) -> jnp.ndarray:
    """Current unicycle state [B, 4] = (x, y, v, yaw) from the batch
    (`src/tbsim/utils/batch_utils.py:46-65`, unicycle branch): last history
    pose + curr_speed. In standardized agent frames x=y=yaw=0."""
    return jnp.concatenate(
        [
            batch.history_positions[:, -1, :],
            batch.curr_speed[:, None],
            batch.history_yaws[:, -1, :],
        ],
        axis=-1,
    )
