"""Occupancy-grid metrics: KDE occupancy of rollout positions.

Capability parity with the reference's occupancy metric family
(`/root/reference/src/tbsim/envs/env_metrics.py:977-1434` OccupancyGrid /
Occupancymet): positions are splatted into a grid with a Gaussian RBF
kernel; reductions report coverage and off-road occupancy mass. TPU-native
re-design: instead of a python defaultdict keyed by visited cells, the grid
is a dense [Hg, Wg] array and each position stamps a static KxK kernel
window via scatter-add — fully vectorized and jit-safe.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OccupancyGridState(NamedTuple):
    grid: jnp.ndarray  # [Hg, Wg] accumulated kernel mass
    origin: jnp.ndarray  # [2] world coords of cell (0, 0)
    step: float  # meters per cell (static)
    # kernel scale: mass decays as exp(-d^2 / (2*sigma)) — sigma acts as the
    # VARIANCE, matching the reference's kernel exactly
    # (env_metrics.py:1009 `np.exp(-||d||**2/2/self.sigma)`)
    sigma: float


def occupancy_init(
    origin: Tuple[float, float], size: Tuple[int, int], step: float = 1.0, sigma: float = 1.0
) -> OccupancyGridState:
    return OccupancyGridState(
        grid=jnp.zeros(size),
        origin=jnp.asarray(origin, jnp.float32),
        step=float(step),
        sigma=float(sigma),
    )


def occupancy_update(
    state: OccupancyGridState, coords: jnp.ndarray, weight: float = 1.0, window: int = 7
) -> OccupancyGridState:
    """Splat [N, 2] world positions with a Gaussian kernel over a static
    window x window cell neighborhood (`env_metrics.py:991-1009,1032-1046`)."""
    Hg, Wg = state.grid.shape
    half = window // 2
    ci = (coords - state.origin) / state.step  # fractional cell coords [N, 2]
    base = jnp.round(ci).astype(jnp.int32)  # [N, 2]
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-half, half + 1), jnp.arange(-half, half + 1), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)  # [K*K, 2]
    cells = base[:, None, :] + offs[None, :, :]  # [N, K*K, 2]
    cell_centers = cells.astype(jnp.float32) * state.step + state.origin
    d2 = jnp.sum((coords[:, None, :] - cell_centers) ** 2, axis=-1)
    kernel = weight * jnp.exp(-d2 / (2 * state.sigma))  # [N, K*K]
    # mask out-of-grid cells; note grid is indexed [y, x]
    cx = cells[..., 0]
    cy = cells[..., 1]
    valid = (cx >= 0) & (cx < Wg) & (cy >= 0) & (cy < Hg) & jnp.isfinite(kernel)
    kernel = jnp.where(valid, kernel, 0.0)
    grid = state.grid.at[
        jnp.clip(cy, 0, Hg - 1).ravel(), jnp.clip(cx, 0, Wg - 1).ravel()
    ].add(kernel.ravel())
    return state._replace(grid=grid)


def occupancy_metrics(
    state: OccupancyGridState,
    drivable_map: jnp.ndarray,
    map_origin: jnp.ndarray,
    map_resolution: float,
    occupied_thresh: float = 0.1,
) -> Dict[str, float]:
    """Coverage + off-road occupancy reductions (`Occupancymet` family)."""
    Hg, Wg = state.grid.shape
    ys = state.origin[1] + jnp.arange(Hg) * state.step
    xs = state.origin[0] + jnp.arange(Wg) * state.step
    px = jnp.clip(((xs - map_origin[0]) / map_resolution).astype(jnp.int32), 0, drivable_map.shape[1] - 1)
    py = jnp.clip(((ys - map_origin[1]) / map_resolution).astype(jnp.int32), 0, drivable_map.shape[0] - 1)
    lane_flag = drivable_map[py[:, None], px[None, :]] > 0  # [Hg, Wg]

    occupied = state.grid > occupied_thresh
    total_mass = jnp.sum(state.grid)
    offroad_mass = jnp.sum(jnp.where(~lane_flag, state.grid, 0.0))
    drivable_cells = jnp.clip(jnp.sum(lane_flag), 1)
    return {
        "occupancy_coverage": float(jnp.sum(occupied & lane_flag) / drivable_cells),
        "offroad_occupancy_fraction": float(offroad_mass / jnp.clip(total_mass, 1e-6)),
        "occupied_cells": float(jnp.sum(occupied)),
    }
