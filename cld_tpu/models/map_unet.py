"""Rasterized map UNet: dense spatial prediction heads over the scene raster.

Capability parity with `RasterizedMapUNet`
(`/root/reference/src/tbsim/models/base_models.py:767-810`): a ResNet
backbone over the [B, H, W, C] raster stack feeding a UNet decoder with
skip connections from every stage, producing a full-resolution
[B, H, W, output_channels] map. Consumers: the spatial goal planner
(`algos/algos.py:258-420` SpatialPlanner — 4 channels: goal-pixel logits +
x/y residual + yaw) and the occupancy metric network
(`algos/metric_algos.py:120-300` OccupancyMetric — one channel per future
frame).

TPU notes: NHWC end to end, nearest-neighbor resize for upsampling (a pure
reshape/broadcast on TPU — no gather), all conv blocks in the configured
compute dtype.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from cld_tpu.models.resnet import ARCHS

Dtype = Any


class _UpBlock(nn.Module):
    """Upsample x2 + concat skip + two 3x3 convs (UNetDecoder step,
    base_models.py:700-765)."""

    filters: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, _ = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, x.shape[-1]), method="nearest")
        if skip is not None:
            if skip.shape[1] != x.shape[1]:
                x = x[:, : skip.shape[1], : skip.shape[2]]
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(x)
        return nn.relu(x)


class RasterizedMapUNet(nn.Module):
    """ResNet-encoder + skip-connected decoder -> [B, H, W, output_channels].

    The output head is linear (logits); channel semantics are the
    consumer's contract (planner: [logit, res_x, res_y, yaw]; occupancy:
    one logit map per future frame).
    """

    arch: str = "resnet18"
    output_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        block_cls, stage_sizes, _ = ARCHS[self.arch]
        B, H, W, _ = image.shape
        x = image.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        skips = []
        for stage, num_blocks in enumerate(stage_sizes):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    filters=64 * 2**stage, strides=strides, dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train=train)
            skips.append(x)  # layer1..layer4 features (H/4 .. H/32)

        # decoder: layer4 -> up(+layer3) -> up(+layer2) -> up(+layer1)
        x = skips[-1]
        for i, skip in enumerate(reversed(skips[:-1])):
            x = _UpBlock(
                filters=skip.shape[-1], dtype=self.dtype, name=f"up{i}"
            )(x, skip, train=train)
        # H/4 -> H: two plain upsample+conv steps (no skips left)
        for i, f in enumerate((64, 32)):
            x = _UpBlock(filters=f, dtype=self.dtype, name=f"up_final{i}")(
                x, None, train=train
            )
        x = x[:, :H, :W]
        out = nn.Conv(self.output_channels, (1, 1), dtype=jnp.float32, name="head")(
            x.astype(jnp.float32)
        )
        return out
