"""ResNet map encoder (flax.linen, NHWC).

Capability parity with `RasterizedMapEncoder`
(`/root/reference/src/tbsim/models/base_models.py:559-650`): a torchvision
ResNet-18/50 with the first conv widened to the rasterized-stack channel
count (31 history + 3 semantic = 34) and the classifier head replaced by
adaptive-avg-pool + Dense(feature_dim). Re-built from the standard ResNet
recipe in NHWC with BatchNorm running statistics threaded through flax's
`batch_stats` collection.

The 224x224x34 map raster is the single largest matmul/conv workload in the
pipeline — NHWC keeps every conv on the MXU without relayouts, and the whole
backbone runs in the configured compute dtype (bfloat16 on TPU).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class BasicBlock(nn.Module):
    """Standard ResNet v1 basic block (two 3x3 convs + identity/projection)."""

    filters: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = nn.Conv(
            self.filters, (3, 3), strides=(self.strides, self.strides),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        if residual.shape[-1] != self.filters or self.strides != 1:
            residual = nn.Conv(
                self.filters, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """ResNet v1 bottleneck block (1x1 -> 3x3 -> 1x1, 4x expansion)."""

    filters: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        out_filters = self.filters * 4
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters, (3, 3), strides=(self.strides, self.strides),
            padding=1, use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn3")(y)
        if residual.shape[-1] != out_filters or self.strides != 1:
            residual = nn.Conv(
                out_filters, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


ARCHS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 512),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 512),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 2048),
}


class ResNetEncoder(nn.Module):
    """ResNet backbone -> global-avg-pool -> Dense(feature_dim).

    Input [B, H, W, C]; output [B, feature_dim]. The fc output carries no
    activation: the reference extracts the raw 'map_model.fc' node
    (`diffuser_helpers.py:315-323`), bypassing RasterizedMapEncoder's output
    ReLU.
    """

    arch: str = "resnet18"
    feature_dim: int = 256
    # pooling head: "avg" (torchvision fc path) or "spatial_softmax"
    # (RasterizedMapEncoder's keypoint pooling option, base_models.py:418-480)
    pool: str = "avg"
    num_kp: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        block_cls, stage_sizes, _ = ARCHS[self.arch]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, num_blocks in enumerate(stage_sizes):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    filters=64 * 2**stage,
                    strides=strides,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train=train)
        if self.pool == "spatial_softmax":
            from cld_tpu.models.spatial_softmax import SpatialSoftmax

            x = SpatialSoftmax(num_kp=self.num_kp, dtype=self.dtype,
                               name="spatial_softmax")(x)  # [B, 2*K]
        else:
            x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to [B, C]
        x = nn.Dense(self.feature_dim, dtype=self.dtype, name="fc")(x)
        return x
