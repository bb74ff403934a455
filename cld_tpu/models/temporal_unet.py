"""1-D temporal UNet denoiser over the latent horizon.

Capability parity with `TemporalMapUnet`
(`/root/reference/src/tbsim/models/temporal.py:49-180`) with the 'concat'
building block (`ResidualTemporalMapBlockConcat`, `temporal.py:16-45`):

* channel ladder transition_dim -> dim*mults (4 -> 64 -> 128 -> 256 for the
  config of record, dim=32, mults=(2,4,8));
* each residual block: Conv1dBlock -> (+ time/cond projection) -> Conv1dBlock
  -> + residual 1x1;
* the conditioning vector for every block is [sinusoidal-t-MLP || cond_feat];
* horizon halves per level (52 -> 26 -> 13), two mid blocks, skip-concat ups.

TPU notes: channels-last [B, T, C]; with T=52 and channels up to 256 the
convolutions lower to MXU matmuls. The denoiser is the innermost op of the
100-step sampling scan, so it is compiled exactly once and reused for every
step and every guidance gradient.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cld_tpu.models.nets import Conv1dBlock, Downsample1d, SinusoidalPosEmb, Upsample1d, mish

Dtype = Any


class ResidualTemporalMapBlock(nn.Module):
    """Two Conv1dBlocks with an additive cond/time projection and a residual
    path (`temporal.py:16-45`)."""

    out_channels: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        out = Conv1dBlock(self.out_channels, self.kernel_size, dtype=self.dtype, name="block0")(x)
        tproj = nn.Dense(self.out_channels, dtype=self.dtype, name="time_dense")(
            mish(t.astype(self.dtype))
        )
        out = out + tproj[:, None, :]
        out = Conv1dBlock(self.out_channels, self.kernel_size, dtype=self.dtype, name="block1")(out)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1,), dtype=self.dtype, name="residual_conv")(x)
        return out + x


class TemporalMapUnet(nn.Module):
    """Denoiser eps_hat = f(x_t, cond_feat, t) over [B, T, D] latents."""

    transition_dim: int = 4
    output_dim: int = 4
    dim: int = 32
    dim_mults: Sequence[int] = (2, 4, 8)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond_feat: jnp.ndarray, time: jnp.ndarray) -> jnp.ndarray:
        """x [B, T, D], cond_feat [B, C], time [B] int -> [B, T, output_dim]."""
        down_factor = 2 ** (len(self.dim_mults) - 1)
        if x.shape[1] % down_factor != 0:
            raise ValueError(
                f"horizon {x.shape[1]} must be divisible by {down_factor} "
                f"(one halving per UNet level); got dim_mults={self.dim_mults}"
            )
        dims = [self.transition_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim

        t = SinusoidalPosEmb(time_dim, name="time_emb")(time)
        t = nn.Dense(time_dim * 4, dtype=self.dtype, name="time_dense0")(t.astype(self.dtype))
        t = mish(t)
        t = nn.Dense(time_dim, dtype=self.dtype, name="time_dense1")(t)
        t = jnp.concatenate([t, cond_feat.astype(self.dtype)], axis=-1)  # [B, time+C]

        x = x.astype(self.dtype)
        num_resolutions = len(in_out)
        h = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= num_resolutions - 1
            x = ResidualTemporalMapBlock(dim_out, dtype=self.dtype, name=f"down{ind}_res0")(x, t)
            x = ResidualTemporalMapBlock(dim_out, dtype=self.dtype, name=f"down{ind}_res1")(x, t)
            h.append(x)
            if not is_last:
                x = Downsample1d(dim_out, dtype=self.dtype, name=f"down{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = ResidualTemporalMapBlock(mid_dim, dtype=self.dtype, name="mid_res0")(x, t)
        x = ResidualTemporalMapBlock(mid_dim, dtype=self.dtype, name="mid_res1")(x, t)

        # ups mirror in_out[1:] reversed; the level-0 skip stays unused, as in
        # the reference (temporal.py:100-116)
        for ind, (dim_in, _) in enumerate(reversed(in_out[1:])):
            is_last = ind >= num_resolutions - 1
            x = jnp.concatenate([x, h.pop()], axis=-1)
            x = ResidualTemporalMapBlock(dim_in, dtype=self.dtype, name=f"up{ind}_res0")(x, t)
            x = ResidualTemporalMapBlock(dim_in, dtype=self.dtype, name=f"up{ind}_res1")(x, t)
            if not is_last:
                x = Upsample1d(dim_in, dtype=self.dtype, name=f"up{ind}_upsample")(x)

        x = Conv1dBlock(x.shape[-1], kernel_size=5, dtype=self.dtype, name="final_block")(x)
        x = nn.Conv(self.output_dim, (1,), dtype=self.dtype, name="final_conv")(x)
        return x
