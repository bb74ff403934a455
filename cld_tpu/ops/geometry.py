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


def obb_collision_matrix(
    pos: jnp.ndarray,
    yaw: jnp.ndarray,
    extent_lw: jnp.ndarray,
    extent_scale: float = 1.0,
) -> jnp.ndarray:
    """Exact oriented-bounding-box overlap for every agent pair.

    The TPU-native replacement for the reference's shapely polygon
    intersection (`geometry_utils.py:339-400` `detect_collision` builds
    each box and host-loops `bbox.intersects`): the separating-axis theorem
    for two rectangles needs only the 4 face normals, so the whole
    [..., Na, Na] matrix is a handful of fused broadcasts — no host loop,
    no early-exit data dependence. Two boxes overlap iff NO axis separates
    them; the projection radius of a box onto axis ``a`` is
    ``(l/2)|u.a| + (w/2)|v.a|`` with u/v its heading/normal.

    pos [..., Na, 2], yaw [..., Na], extent_lw [..., Na, 2] (length, width;
    broadcastable). ``extent_scale`` inflates/deflates the boxes (1.0 =
    exact geometric overlap). Returns [..., Na, Na] bool; the diagonal is
    True (a box overlaps itself) — mask with a pair-validity matrix.
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)  # [..., Na]
    hl = extent_lw[..., 0] * (0.5 * extent_scale)
    hw = extent_lw[..., 1] * (0.5 * extent_scale)
    rel = pos[..., None, :, :] - pos[..., :, None, :]  # [..., i, j, 2] p_j - p_i
    rx, ry = rel[..., 0], rel[..., 1]
    ci, si = c[..., :, None], s[..., :, None]  # row (i) frames
    cj, sj = c[..., None, :], s[..., None, :]  # col (j) frames
    # |cos/sin(yaw_i - yaw_j)|: projections between the two boxes' axes
    cosd = jnp.abs(ci * cj + si * sj)
    sind = jnp.abs(si * cj - ci * sj)
    hli, hwi = hl[..., :, None], hw[..., :, None]
    hlj, hwj = hl[..., None, :], hw[..., None, :]
    sep = (
        (jnp.abs(rx * ci + ry * si) > hli + hlj * cosd + hwj * sind)
        | (jnp.abs(-rx * si + ry * ci) > hwi + hlj * sind + hwj * cosd)
        | (jnp.abs(rx * cj + ry * sj) > hlj + hli * cosd + hwi * sind)
        | (jnp.abs(-rx * sj + ry * cj) > hwj + hli * sind + hwi * cosd)
    )
    return ~sep
