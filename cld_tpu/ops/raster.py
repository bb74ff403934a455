"""On-device rasterization: agent-view map warping + history painting.

These replace the reference's per-frame host-side raster assembly
(`/root/reference/src/tbsim/utils/trajdata_utils.py:123-156` rasterize_agents
and trajdata's map patch extraction) with pure gather/scatter kernels so the
closed-loop simulator never leaves the device:

* `warp_to_agent_frame`: nearest-neighbor affine resampling of a world-frame
  semantic raster into each agent's egocentric viewport — one fused gather;
* `rasterize_history`: paint (ego +1 / others -1) agent-history channels,
  matching the reference's scatter semantics including the index-0/index-max
  invalid-pixel correction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cld_tpu.ops.geometry import transform_points


def warp_to_agent_frame(
    world_map: jnp.ndarray,
    world_from_agent: jnp.ndarray,
    world_map_resolution: float,
    world_map_origin: jnp.ndarray,
    raster_size: int = 224,
    pixel_size: float = 0.5,
    ego_center: Tuple[float, float] = (-0.5, 0.0),
    fill_value: float = 0.0,
) -> jnp.ndarray:
    """Sample each agent's egocentric raster from a world-frame map.

    Args:
        world_map: [Hw, Ww, C] scene raster (world frame, axis-aligned).
        world_from_agent: [B, 3, 3] agent -> world (meters).
        world_map_resolution: meters per world-map pixel.
        world_map_origin: [2] world coords of world-map pixel (0, 0).
    Returns:
        [B, raster_size, raster_size, C]
    """
    H = W = raster_size
    scale = 1.0 / pixel_size
    # same ego-center convention as raster_from_agent_matrix (and the
    # reference, trajdata_utils.py:385-395): agent at ((1+e)/2)*size
    cx = (1.0 + ego_center[0]) / 2.0 * raster_size
    cy = (1.0 + ego_center[1]) / 2.0 * raster_size
    xs = (jnp.arange(W, dtype=jnp.float32) - cx) / scale
    ys = (jnp.arange(H, dtype=jnp.float32) - cy) / scale
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W] agent-frame meters
    pts = jnp.stack([gx, gy], axis=-1).reshape(1, -1, 2)  # [1, H*W, 2]

    B = world_from_agent.shape[0]
    world_pts = transform_points(jnp.broadcast_to(pts, (B, H * W, 2)), world_from_agent)
    wp = (world_pts - world_map_origin) / world_map_resolution  # world pixels
    ix = jnp.round(wp[..., 0]).astype(jnp.int32)
    iy = jnp.round(wp[..., 1]).astype(jnp.int32)
    Hw, Ww = world_map.shape[:2]
    valid = (ix >= 0) & (ix < Ww) & (iy >= 0) & (iy < Hw)
    vals = world_map[jnp.clip(iy, 0, Hw - 1), jnp.clip(ix, 0, Ww - 1)]  # [B, H*W, C]
    vals = jnp.where(valid[..., None], vals, fill_value)
    return vals.reshape(B, H, W, -1)


def rasterize_history(
    ego_hist: jnp.ndarray,
    ego_avail: jnp.ndarray,
    neighbor_hist: jnp.ndarray,
    neighbor_avail: jnp.ndarray,
    raster_from_agent: jnp.ndarray,
    raster_size: int = 224,
) -> jnp.ndarray:
    """Paint agent-history channels (`rasterize_agents`,
    `trajdata_utils.py:123-156`).

    Args:
        ego_hist: [B, Th, 2] agent-frame positions (ego of each raster).
        ego_avail: [B, Th] validity.
        neighbor_hist: [B, S, Th, 2].
        neighbor_avail: [B, S, Th].
        raster_from_agent: [B, 3, 3].
    Returns:
        [B, Th, H, W] channels: ego +1, others -1 (ego painted last, wins).
    """
    B, Th, _ = ego_hist.shape
    S = neighbor_hist.shape[1]
    H = W = raster_size

    all_pos = jnp.concatenate([neighbor_hist, ego_hist[:, None]], axis=1)  # [B, S+1, Th, 2]
    all_avail = jnp.concatenate([neighbor_avail, ego_avail[:, None]], axis=1) > 0

    pix = transform_points(all_pos.reshape(B, -1, 2), raster_from_agent)
    pix = pix.reshape(B, S + 1, Th, 2)
    # invalid positions -> flat index 0, corrected afterwards (reference trick)
    px = jnp.clip(jnp.round(pix[..., 0]), 0, W - 1).astype(jnp.int32)
    py = jnp.clip(jnp.round(pix[..., 1]), 0, H - 1).astype(jnp.int32)
    flat_idx = jnp.where(all_avail, py * W + px, 0)  # [B, S+1, Th]

    img = jnp.zeros((B, Th, H * W), dtype=jnp.float32)

    def paint(img_bt, idx_bt, value):
        # img_bt [Th, HW], idx_bt [A, Th]
        return img_bt.at[jnp.broadcast_to(jnp.arange(Th)[None], idx_bt.shape), idx_bt].set(value)

    # neighbors first (-1), then ego (+1) so ego overwrites
    img = jax.vmap(lambda im, ix: paint(im, ix, -1.0))(img, flat_idx[:, :S])
    img = jax.vmap(lambda im, ix: paint(im, ix, 1.0))(img, flat_idx[:, S:])
    # correct index 0 (invalid scatter target) and max index (oob clamps)
    img = img.at[:, :, 0].set(0.0)
    img = img.at[:, :, -1].set(0.0)
    return img.reshape(B, Th, H, W)
