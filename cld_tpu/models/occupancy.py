"""Occupancy prediction network: per-future-frame spatial likelihood maps.

Capability parity with `OccupancyMetric`
(`/root/reference/src/tbsim/algos/metric_algos.py:120-300`): a
RasterizedMapUNet with one output channel per (subsampled) future frame,
supervised by the agent's rasterized future positions — masked pixel BCE +
pixel CE per frame — and scoring trajectories by joint (softmax) /
independent (sigmoid) pixel likelihoods.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.models.map_unet import RasterizedMapUNet
from cld_tpu.ops.geometry import transform_points

Dtype = Any


def get_spatial_trajectory_supervision(
    batch: TrafficBatch, every_n_frame: int = 1
) -> Dict[str, jnp.ndarray]:
    """Per-frame goal-pixel supervision of the ego future
    (`AlgoUtils.get_spatial_trajectory_supervision`)."""
    B, H, W = batch.image.shape[0], batch.image.shape[1], batch.image.shape[2]
    pos = batch.target_positions[:, ::every_n_frame]  # [B, Tf, 2]
    mask = batch.target_availabilities[:, ::every_n_frame]  # [B, Tf]
    Tf = pos.shape[1]
    raster = transform_points(pos, batch.raster_from_agent)  # [B, Tf, 2]
    rx = jnp.clip(raster[..., 0], 0.0, W - 1e-5)
    ry = jnp.clip(raster[..., 1], 0.0, H - 1e-5)
    pix = jnp.floor(jnp.stack([rx, ry], axis=-1))
    flat = (pix[..., 1] * W + pix[..., 0]).astype(jnp.int32)  # [B, Tf]
    spatial = jax.nn.one_hot(flat, H * W, dtype=jnp.float32).reshape(B, Tf, H, W)
    return {
        "traj_spatial_map": spatial,
        "traj_position_pixel_flat": flat,
        "mask": (mask > 0).astype(jnp.float32),
    }


def occupancy_losses(
    pred_map: jnp.ndarray, sup: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Masked pixel BCE + CE (`metric_algos.py:218-240`). pred_map
    [B, Tf, H, W] logits."""
    B, Tf, H, W = pred_map.shape
    flat = pred_map.reshape(B, Tf, H * W)
    tgt_map = sup["traj_spatial_map"].reshape(B, Tf, H * W)
    mask = sup["mask"]  # [B, Tf]
    bce = (
        jnp.maximum(flat, 0) - flat * tgt_map + jnp.log1p(jnp.exp(-jnp.abs(flat)))
    )
    bce = jnp.mean(jnp.mean(bce, axis=-1) * mask)
    logp = jax.nn.log_softmax(flat, axis=-1)
    picked = jnp.take_along_axis(logp, sup["traj_position_pixel_flat"][..., None], axis=-1)[..., 0]
    ce = jnp.mean(-picked * mask)
    return {"pixel_bce_loss": bce, "pixel_ce_loss": ce}


def occupancy_likelihood(
    pred_map: jnp.ndarray, traj_pos: jnp.ndarray, raster_from_agent: jnp.ndarray,
    every_n_frame: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Joint/independent likelihood of a trajectory under the predicted maps
    (`OccupancyMetric.compute_likelihood`, `metric_algos.py:191-216`)."""
    B, Tf, H, W = pred_map.shape
    pos = traj_pos[:, ::every_n_frame][:, :Tf]
    raster = transform_points(pos, raster_from_agent)
    rx = jnp.clip(raster[..., 0], 0.0, W - 1e-5)
    ry = jnp.clip(raster[..., 1], 0.0, H - 1e-5)
    flat_idx = (jnp.floor(ry) * W + jnp.floor(rx)).astype(jnp.int32)  # [B, Tf]
    flat = pred_map.reshape(B, Tf, H * W)
    joint = jnp.take_along_axis(jax.nn.softmax(flat, axis=-1), flat_idx[..., None], axis=-1)[..., 0]
    indep = jnp.take_along_axis(jax.nn.sigmoid(flat), flat_idx[..., None], axis=-1)[..., 0]
    return {"joint_likelihood": joint, "indep_likelihood": indep}


class OccupancyPredictor(nn.Module):
    """UNet over the raster -> [B, Tf, H, W] occupancy logits + losses."""

    arch: str = "resnet18"
    future_num_frames: int = 52
    every_n_frame: int = 4
    dtype: Dtype = jnp.float32

    @property
    def num_out_frames(self) -> int:
        return -(-self.future_num_frames // self.every_n_frame)  # ceil div

    @nn.compact
    def __call__(self, batch: TrafficBatch, train: bool = False):
        pred = RasterizedMapUNet(
            arch=self.arch, output_channels=self.num_out_frames,
            dtype=self.dtype, name="unet",
        )(batch.image, train=train)  # [B, H, W, Tf]
        pred_map = pred.transpose(0, 3, 1, 2)  # [B, Tf, H, W]
        sup = get_spatial_trajectory_supervision(batch, self.every_n_frame)
        losses = occupancy_losses(pred_map, sup)
        total = losses["pixel_bce_loss"] + losses["pixel_ce_loss"]
        lik = occupancy_likelihood(
            pred_map, batch.target_positions, batch.raster_from_agent,
            self.every_n_frame,
        )
        return {
            "loss": total, **losses,
            "joint_likelihood": jnp.mean(lik["joint_likelihood"]),
            "indep_likelihood": jnp.mean(lik["indep_likelihood"]),
            "occupancy_map": pred_map,
        }
