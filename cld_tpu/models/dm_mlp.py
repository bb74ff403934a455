"""Residual-MLP denoiser — the alternative to the temporal UNet.

Capability parity with `MLPResNetwork`
(`/root/reference/models/dm/dm_mlp.py:18-53`): flatten the latent sequence,
concatenate sinusoidal time embedding + conditioning, pass through residual
MLP blocks, reshape back. Same (x, cond_feat, t) signature as
TemporalMapUnet so it drops into every diffusion algorithm.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cld_tpu.models.nets import SinusoidalPosEmb, mish

Dtype = Any


class ResidualMLPBlock(nn.Module):
    width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.width, dtype=self.dtype)(x)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = mish(h)
        h = nn.Dense(self.width, dtype=self.dtype)(h)
        if x.shape[-1] != self.width:
            x = nn.Dense(self.width, dtype=self.dtype)(x)
        return mish(x + h)


class MLPResDenoiser(nn.Module):
    """(x [B, T, D], cond [B, C], t [B]) -> [B, T, D]."""

    horizon: int = 52
    transition_dim: int = 4
    width: int = 512
    num_blocks: int = 3
    time_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond_feat, time):
        B, T, D = x.shape
        t = SinusoidalPosEmb(self.time_dim)(time)
        t = nn.Dense(self.time_dim * 4, dtype=self.dtype)(t.astype(self.dtype))
        t = mish(t)
        t = nn.Dense(self.time_dim, dtype=self.dtype)(t)
        h = jnp.concatenate(
            [x.reshape(B, T * D).astype(self.dtype), t, cond_feat.astype(self.dtype)],
            axis=-1,
        )
        for i in range(self.num_blocks):
            h = ResidualMLPBlock(self.width, dtype=self.dtype, name=f"block{i}")(h)
        out = nn.Dense(T * D, dtype=self.dtype, name="out")(h)
        return out.reshape(B, T, D)
