"""Map feature grids: per-agent ROI features + per-step trajectory queries.

Capability parity with the reference's grid-feature conditioning stack:
`RasterizeROIEncoder`/`RotatedROIAlign`
(`/root/reference/src/tbsim/models/base_models.py:650-810`: RoI-align crops
of a shared map feature grid per agent), `MapGridDecoder`
(`diffuser_helpers.py:352-440`) and the per-denoise-step trajectory feature
query `query_map_feats` (`models/diffuser.py:752-760` via
`query_feature_grid`, `diffuser_helpers.py:410-440`).

TPU-first re-design: a conv backbone encodes the raster ONCE into a feature
grid; per-agent rotated ROI crops are affine gathers (the same machinery as
the simulator's map warp), and per-trajectory-point features are bilinear
gathers — no CUDA ROI-align kernel, just fused gathers XLA pipelines.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cld_tpu.models.nets import mish

Dtype = Any


def query_feature_grid(points: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear feature lookup (`diffuser_helpers.py:410-440`).

    points [B, N, 2] (x, y) in grid-pixel coords; grid [B, H, W, C] ->
    [B, N, C]. Out-of-range points clamp to the border.
    """
    H, W = grid.shape[1:3]
    x = jnp.clip(points[..., 0], 0.0, W - 1.001)
    y = jnp.clip(points[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    b = jnp.arange(grid.shape[0])[:, None]
    g00 = grid[b, y0, x0]
    g01 = grid[b, y0, x1]
    g10 = grid[b, y1, x0]
    g11 = grid[b, y1, x1]
    return (
        g00 * (1 - wx) * (1 - wy)
        + g01 * wx * (1 - wy)
        + g10 * (1 - wx) * wy
        + g11 * wx * wy
    )


def rotated_roi_crop(
    grid: jnp.ndarray,
    center: jnp.ndarray,
    yaw: jnp.ndarray,
    roi_size: Tuple[int, int] = (7, 7),
    roi_extent: float = 14.0,
) -> jnp.ndarray:
    """Rotated ROI crop via affine bilinear sampling
    (`RotatedROIAlign`, `base_models.py:650-676`).

    grid [B, H, W, C]; center [B, A, 2] grid-pixel coords; yaw [B, A] ->
    [B, A, roi_h, roi_w, C]. roi_extent is the crop size in grid pixels.
    """
    B, H, W, C = grid.shape
    A = center.shape[1]
    rh, rw = roi_size
    ys = jnp.linspace(-0.5, 0.5, rh) * roi_extent
    xs = jnp.linspace(-0.5, 0.5, rw) * roi_extent
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [rh, rw]
    local = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)  # [rh*rw, 2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)  # [B, A]
    rx = local[None, None, :, 0] * c[..., None] - local[None, None, :, 1] * s[..., None]
    ry = local[None, None, :, 0] * s[..., None] + local[None, None, :, 1] * c[..., None]
    pts = jnp.stack([rx, ry], axis=-1) + center[:, :, None, :]  # [B, A, rh*rw, 2]
    feats = query_feature_grid(pts.reshape(B, -1, 2), grid)
    return feats.reshape(B, A, rh, rw, C)


class MapGridEncoder(nn.Module):
    """Shared conv backbone raster -> feature grid (`MapGridDecoder`
    capability, `diffuser_helpers.py:352-408`): a light pyramid that keeps a
    spatial grid at 1/down_factor resolution for ROI crops and trajectory
    queries."""

    feature_dim: int = 32
    widths: Tuple[int, ...] = (32, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = image.astype(self.dtype)
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype, name=f"gn{i}")(x)
            x = mish(x)
        return nn.Conv(self.feature_dim, (1, 1), dtype=self.dtype, name="proj")(x)

    @property
    def down_factor(self) -> int:
        return 2 ** len(self.widths)


class ROIMapEncoder(nn.Module):
    """Per-agent ROI feature vectors from a shared scene feature grid
    (`RasterizeROIEncoder`, `base_models.py:678-810`)."""

    feature_dim: int = 32
    agent_feature_dim: int = 64
    roi_size: Tuple[int, int] = (7, 7)
    roi_extent_m: float = 20.0
    pixel_size: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, image: jnp.ndarray, centers_px: jnp.ndarray, yaws: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        """image [B, H, W, C]; centers_px [B, A, 2] raster pixels; yaws
        [B, A] -> [B, A, agent_feature_dim]."""
        grid_enc = MapGridEncoder(self.feature_dim, dtype=self.dtype, name="grid")
        grid = grid_enc(image, train=train)
        down = grid_enc.down_factor
        roi = rotated_roi_crop(
            grid, centers_px / down, yaws, self.roi_size,
            roi_extent=self.roi_extent_m / self.pixel_size / down,
        )  # [B, A, rh, rw, F]
        pooled = jnp.mean(roi, axis=(2, 3))
        return nn.Dense(self.agent_feature_dim, dtype=self.dtype, name="head")(pooled)
