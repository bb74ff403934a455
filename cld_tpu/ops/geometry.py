"""Batched 2-D geometry: affine point transforms and raster frames.

Parity targets: `transform_points_tensor`
(`/root/reference/src/tbsim/utils/geometry_utils.py` and
`models/rl/criticmodel.py:88-112`) and the raster_from_agent construction in
`parse_node_centric` (`src/tbsim/utils/trajdata_utils.py:385-395`): the
agent-centric raster frame is a scale-plus-offset determined by pixel_size
and ego_center.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def transform_points(points: jnp.ndarray, tf: jnp.ndarray) -> jnp.ndarray:
    """Apply batched 3x3 homogeneous transforms to 2-D points.

    points: [B, ..., 2], tf: [B, 3, 3] broadcast over the middle dims.
    Matches `transform_points_tensor` (points @ linear^T + translation).
    """
    batch = points.shape[0]
    flat = points.reshape(batch, -1, 2)
    linear = tf[:, :2, :2]
    translation = tf[:, :2, 2]
    out = jnp.einsum("bnd,bed->bne", flat, linear) + translation[:, None, :]
    return out.reshape(points.shape)


def raster_from_agent_matrix(
    raster_size: int = 224, pixel_size: float = 0.5, ego_center=(-0.5, 0.0)
) -> np.ndarray:
    """Agent frame -> raster pixel frame, as built by the reference's batch
    parser (`trajdata_utils.py:385-395`): scale by 1/pixel_size and place the
    agent at pixel ((1 + ego_center)/2) * raster_size — e.g. (56, 112) for
    the 224px config of record, so the road ahead fills the viewport."""
    scale = 1.0 / pixel_size
    cx = (1.0 + ego_center[0]) / 2.0 * raster_size
    cy = (1.0 + ego_center[1]) / 2.0 * raster_size
    return np.array(
        [[scale, 0.0, cx], [0.0, scale, cy], [0.0, 0.0, 1.0]], dtype=np.float32
    )


def rotation_matrix_2d(yaw: jnp.ndarray) -> jnp.ndarray:
    """[..., 2, 2] rotation matrices from yaw angles [...]."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def agent_from_world_matrix(pos: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] transform taking world points into the frame of an agent
    at (pos, yaw). Inverse of `world_from_agent_matrix`."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    tx = -(c * pos[..., 0] + s * pos[..., 1])
    ty = -(-s * pos[..., 0] + c * pos[..., 1])
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, s, tx], axis=-1),
            jnp.stack([-s, c, ty], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )


def world_from_agent_matrix(pos: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] transform taking agent-frame points into world frame."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, pos[..., 0]], axis=-1),
            jnp.stack([s, c, pos[..., 1]], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
