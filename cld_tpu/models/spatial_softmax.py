"""Spatial-softmax keypoint pooling.

Capability parity with `SpatialSoftmax`
(`/root/reference/src/tbsim/models/base_models.py:418-480`, the optional
pooling head of RasterizedMapEncoder): per-channel softmax attention over
the spatial grid producing expected (x, y) keypoints — a structured
alternative to global average pooling that preserves spatial localization.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class SpatialSoftmax(nn.Module):
    """[B, H, W, C] feature map -> [B, num_kp * 2] expected keypoints.

    num_kp=None keeps one keypoint per input channel; otherwise a 1x1 conv
    mixes channels first. `temperature` is learnable when
    learnable_temperature=True (matching the reference's options).
    """

    num_kp: Optional[int] = None
    temperature: float = 1.0
    learnable_temperature: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        if self.num_kp is not None and self.num_kp != C:
            x = nn.Conv(self.num_kp, (1, 1), dtype=self.dtype, name="kp_conv")(x)
            C = self.num_kp
        if self.learnable_temperature:
            log_t = self.param(
                "log_temperature", nn.initializers.constant(jnp.log(self.temperature)), ()
            )
            temperature = jnp.exp(log_t)
        else:
            temperature = self.temperature

        # normalized pixel grids in [-1, 1]
        pos_x = jnp.linspace(-1.0, 1.0, W)
        pos_y = jnp.linspace(-1.0, 1.0, H)
        feat = x.reshape(B, H * W, C) / temperature
        attn = nn.softmax(feat, axis=1)  # over spatial locations
        grid = jnp.stack(
            [
                jnp.tile(pos_x[None, :], (H, 1)).reshape(-1),
                jnp.tile(pos_y[:, None], (1, W)).reshape(-1),
            ],
            axis=-1,
        )  # [H*W, 2]
        kp = jnp.einsum("bnc,nd->bcd", attn, grid)  # [B, C, 2]
        return kp.reshape(B, C * 2)
