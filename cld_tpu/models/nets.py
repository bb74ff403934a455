"""Shared network building blocks.

Parity targets: `MLP` (`/root/reference/src/tbsim/models/base_models.py:21-113`),
`SinusoidalPosEmb`/`Conv1dBlock`/`Downsample1d`/`Upsample1d`
(`/root/reference/src/tbsim/models/diffuser_helpers.py:20-67`).

TPU-first conventions: channels-last layouts everywhere ([B, T, C] for
temporal convs, [B, H, W, C] for images) so XLA lowers convs straight onto
the MXU without layout transposes; a `dtype` knob selects the compute dtype
(bfloat16 on TPU) while parameters stay float32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation: x * tanh(softplus(x))."""
    return x * jnp.tanh(nn.softplus(x))


class MLP(nn.Module):
    """Hidden layers of Dense[+LayerNorm]+activation, final plain Dense.

    Matches the reference MLP layer pattern (base_models.py:52-66):
    normalization=True inserts LayerNorm after each hidden Dense.
    """

    output_dim: int
    layer_dims: Sequence[int] = ()
    normalization: bool = False
    activation: Callable = nn.relu
    output_activation: Optional[Callable] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i, width in enumerate(self.layer_dims):
            x = nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(x)
            if self.normalization:
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(x)
            x = self.activation(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="dense_out")(x)
        if self.output_activation is not None:
            x = self.output_activation(x)
        return x


class SinusoidalPosEmb(nn.Module):
    """Transformer-style sinusoidal timestep embedding
    (diffuser_helpers.py:20-32)."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim) * -emb)
        emb = t.astype(jnp.float32)[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class FusedGroupNorm(nn.Module):
    """GroupNorm over [B, T, C] with a TPU-shaped stats pass.

    Numerics match nn.GroupNorm / torch.nn.GroupNorm (f32 statistics,
    E[x^2] - E[x]^2 variance clamped at 0, epsilon inside the rsqrt) up to
    f32 summation order; parameters are the same {scale, bias} [C] leaves,
    so checkpoints are interchangeable with the nn.GroupNorm layout.

    Why not nn.GroupNorm: its stats reduce over (T, C/G) — a partial
    CROSS-LANE reduction over 32-lane channel groups that Mosaic lowers
    ~3x off the bandwidth floor; at 18 GroupNorms per denoiser call those
    convert+reduce fusions were ~50% of the UNet's device time
    (scripts/micro_denoiser.py trace). Here the big pass reduces over T
    only (sublanes — one variadic sum/sumsq sweep of x), and the awkward
    cross-lane group fold happens on the tiny [B, C] moments instead.
    """

    num_groups: int = 8
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, C = x.shape
        G = self.num_groups
        if C % G != 0:
            raise ValueError(
                f"FusedGroupNorm: num_groups={G} must divide features={C}"
            )
        Cg = C // G
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        x32 = x.astype(jnp.float32)
        s = jnp.sum(x32, axis=1)  # [B, C] — one fused read of x for both
        ss = jnp.sum(x32 * x32, axis=1)
        n = T * Cg
        mean = jnp.sum(s.reshape(B, G, Cg), axis=-1) / n  # [B, G]
        var = jnp.maximum(
            jnp.sum(ss.reshape(B, G, Cg), axis=-1) / n - mean * mean, 0.0
        )
        inv = jax.lax.rsqrt(var + self.epsilon)
        mean_c = jnp.repeat(mean, Cg, axis=-1)  # [B, C]
        inv_c = jnp.repeat(inv, Cg, axis=-1)
        y = (x32 - mean_c[:, None, :]) * (
            inv_c[:, None, :] * scale[None, None, :]
        ) + bias
        return y.astype(self.dtype)


class Conv1dBlock(nn.Module):
    """Conv1d -> GroupNorm(8) -> Mish over [B, T, C]
    (diffuser_helpers.py:50-67)."""

    out_channels: int
    kernel_size: int = 5
    n_groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size,),
            padding=self.kernel_size // 2,
            dtype=self.dtype,
            name="conv",
        )(x)
        # epsilon matches torch.nn.GroupNorm (1e-5); flax defaults to 1e-6
        x = FusedGroupNorm(
            num_groups=self.n_groups, epsilon=1e-5, dtype=self.dtype, name="norm"
        )(x)
        return mish(x)


class Downsample1d(nn.Module):
    """Stride-2 conv halving the horizon (diffuser_helpers.py:34-40)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.channels, kernel_size=(3,), strides=(2,), padding=1, dtype=self.dtype
        )(x)


class Upsample1d(nn.Module):
    """Stride-2 transposed conv doubling the horizon
    (diffuser_helpers.py:42-48)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.ConvTranspose(
            self.channels, kernel_size=(4,), strides=(2,), padding="SAME", dtype=self.dtype
        )(x)
