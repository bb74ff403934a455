"""Spatial goal planner: dense goal-location prediction over the raster.

Capability parity with `SpatialPlanner` (`/root/reference/src/tbsim/algos/
algos.py:258-470`): a RasterizedMapUNet predicts a 4-channel map —
[goal-pixel logits, x residual, y residual, yaw] — supervised by the last
available future frame (`algo_utils.py:87-132` get_spatial_goal_supervision).
Losses: pixel CE over the flattened logit map + pixel BCE vs the one-hot
goal map + residual/yaw MSE at the ground-truth pixel. Decoding softmaxes
the logit map (optionally masked to the drivable region), takes the argmax
pixel + its sigmoid residuals, and maps back to agent frame.

Everything is static-shape: the "last available index" is an argmax over a
reversed availability mask, and per-pixel gathers use flattened indices.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.models.map_unet import RasterizedMapUNet
from cld_tpu.ops.geometry import transform_points

Dtype = Any


def last_available_index(avail: jnp.ndarray) -> jnp.ndarray:
    """[B, T] availability -> [B] index of the last valid frame (0 if none)
    (`algo_utils.py` get_last_available_index)."""
    T = avail.shape[1]
    rev = jnp.flip(avail > 0, axis=1)
    has = jnp.any(rev, axis=1)
    idx = T - 1 - jnp.argmax(rev, axis=1)
    return jnp.where(has, idx, 0).astype(jnp.int32)


def get_spatial_goal_supervision(batch: TrafficBatch) -> Dict[str, jnp.ndarray]:
    """Goal pixel/residual/yaw supervision (`algo_utils.py:87-132`)."""
    B, H, W = batch.image.shape[0], batch.image.shape[1], batch.image.shape[2]
    g_idx = last_available_index(batch.target_availabilities)  # [B]
    barange = jnp.arange(B)
    goal_pos_agent = batch.target_positions[barange, g_idx]  # [B, 2]
    goal_yaw = batch.target_yaws[barange, g_idx]  # [B, 1]

    goal_raster = transform_points(
        goal_pos_agent[:, None], batch.raster_from_agent
    )[:, 0]  # [B, 2]
    goal_raster = jnp.stack(
        [
            jnp.clip(goal_raster[:, 0], 0.0, W - 1e-5),
            jnp.clip(goal_raster[:, 1], 0.0, H - 1e-5),
        ],
        axis=-1,
    )
    goal_pixel = jnp.floor(goal_raster)
    residual = goal_raster - goal_pixel  # in [0, 1)
    flat = (goal_pixel[:, 1] * W + goal_pixel[:, 0]).astype(jnp.int32)  # [B]
    spatial_map = jax.nn.one_hot(flat, H * W, dtype=jnp.float32).reshape(B, H, W)
    return {
        "goal_position_residual": residual,
        "goal_spatial_map": spatial_map,
        "goal_position_pixel": goal_pixel,
        "goal_position_pixel_flat": flat,
        "goal_position": goal_pos_agent,
        "goal_yaw": goal_yaw,
    }


def spatial_planner_losses(
    pred_map: jnp.ndarray, goal_sup: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """`SpatialPlanner.compute_losses` (`algos.py:365-400`)."""
    B, H, W, _ = pred_map.shape
    logits = pred_map[..., 0]  # [B, H, W]
    flat_logits = logits.reshape(B, H * W)
    tgt_flat = goal_sup["goal_position_pixel_flat"]

    bce = jnp.mean(
        jnp.maximum(flat_logits, 0)
        - flat_logits * goal_sup["goal_spatial_map"].reshape(B, H * W)
        + jnp.log1p(jnp.exp(-jnp.abs(flat_logits)))
    )
    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    ce = -jnp.mean(logp[jnp.arange(B), tgt_flat])

    # residual + yaw at the GT pixel
    local = pred_map.reshape(B, H * W, -1)[jnp.arange(B), tgt_flat]  # [B, 4]
    res_pred = jax.nn.sigmoid(local[:, 1:3])
    yaw_pred = local[:, 3:4]
    res_loss = jnp.mean((res_pred - goal_sup["goal_position_residual"]) ** 2)
    yaw_loss = jnp.mean((yaw_pred - goal_sup["goal_yaw"]) ** 2)
    return {
        "pixel_bce_loss": bce,
        "pixel_ce_loss": ce,
        "pixel_res_loss": res_loss,
        "pixel_yaw_loss": yaw_loss,
    }


def decode_spatial_prediction(
    pred_map: jnp.ndarray,
    raster_from_agent: jnp.ndarray,
    drivable_map: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """MAP decode (`AlgoUtils.decode_spatial_prediction` +
    `SpatialPlanner.forward_prediction`, `algos.py:292-338`)."""
    B, H, W, _ = pred_map.shape
    flat_logits = pred_map[..., 0].reshape(B, H * W)
    prob = jax.nn.softmax(flat_logits, axis=-1)
    if drivable_map is not None:
        mask = (drivable_map > 0).reshape(B, H * W)
        # if nowhere is drivable fall back to the unmasked map
        usable = jnp.any(mask, axis=-1, keepdims=True)
        prob = jnp.where(usable, prob * mask, prob)
    flat_idx = jnp.argmax(prob, axis=-1)  # [B]
    pix_x = (flat_idx % W).astype(jnp.float32)
    pix_y = (flat_idx // W).astype(jnp.float32)
    local = pred_map.reshape(B, H * W, -1)[jnp.arange(B), flat_idx]  # [B, 4]
    res = jax.nn.sigmoid(local[:, 1:3])
    yaw = local[:, 3:4]
    pos_raster = jnp.stack([pix_x, pix_y], axis=-1) + res
    agent_from_raster = jnp.linalg.inv(raster_from_agent)
    pos_agent = transform_points(pos_raster[:, None], agent_from_raster)[:, 0]
    prob_at = prob[jnp.arange(B), flat_idx]
    return {
        "positions": pos_agent,
        "yaws": yaw,
        "log_likelihood": jnp.log(prob_at + 1e-12),
        "pixel": jnp.stack([pix_x, pix_y], axis=-1),
    }


class SpatialPlannerNet(nn.Module):
    """The SpatialPlanner network + loss head as one flax module."""

    arch: str = "resnet18"
    loss_weights: Dict[str, float] = None  # defaults below
    dtype: Dtype = jnp.float32

    def _weights(self):
        # algo_config.loss_weights defaults (`algo_config.py:51-62`)
        return self.loss_weights or {
            "pixel_bce_loss": 0.0,
            "pixel_ce_loss": 1.0,
            "pixel_res_loss": 1.0,
            "pixel_yaw_loss": 1.0,
        }

    @nn.compact
    def __call__(self, batch: TrafficBatch, train: bool = False):
        pred_map = RasterizedMapUNet(
            arch=self.arch, output_channels=4, dtype=self.dtype, name="unet"
        )(batch.image, train=train)
        goal_sup = get_spatial_goal_supervision(batch)
        losses = spatial_planner_losses(pred_map, goal_sup)
        w = self._weights()
        total = sum(losses[k] * w[k] for k in losses)
        # goal position error metric (for eval; argmax decode)
        dec = decode_spatial_prediction(pred_map, batch.raster_from_agent)
        pos_err = jnp.mean(
            jnp.linalg.norm(dec["positions"] - goal_sup["goal_position"], axis=-1)
        )
        return {"loss": total, **losses, "goal_pos_err": pos_err,
                "pred_map": pred_map}
