"""Scene-level transformer denoiser — the CTG++ model family.

Capability parity with `SceneTransformer` / `SceneDiffuserModel`
(`/root/reference/src/tbsim/models/scenetemporal.py:39`,
`scenediffuser.py:38`): scene-centric diffusion where all agents in a scene
are denoised jointly with factorized attention — self-attention along the
time axis (per agent) alternating with self-attention along the agent axis
(per timestep), conditioned on per-agent context features and the diffusion
step.

TPU notes: factorized [A]x[T] attention keeps every attention matmul dense
and small-batch-free ([B*A, T, T] and [B*T, A, A]); padding agents are
masked via the standard additive attention mask, so ragged scenes stay
static-shape.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from cld_tpu.models.nets import SinusoidalPosEmb, mish

Dtype = Any


class FactorizedBlock(nn.Module):
    """time-attention -> agent-attention -> MLP, each with residual + LN."""

    width: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, agent_mask):
        """h [B, A, T, F]; agent_mask [B, A] (True = real agent)."""
        B, A, T, F = h.shape

        # temporal attention (per agent)
        x = h.reshape(B * A, T, F)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="time_attn"
        )(y, y)
        x = x + y
        h = x.reshape(B, A, T, F)

        # agent attention (per timestep), padding masked
        x = h.transpose(0, 2, 1, 3).reshape(B * T, A, F)
        mask = agent_mask[:, None, None, None, :]  # [B, 1, 1, 1, A]
        mask = jnp.broadcast_to(mask, (B, T, 1, A, A)).reshape(B * T, 1, A, A)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="agent_attn"
        )(y, y, mask=mask)
        x = x + y
        h = x.reshape(B, T, A, F).transpose(0, 2, 1, 3)

        # MLP
        y = nn.LayerNorm(dtype=self.dtype)(h)
        y = nn.Dense(self.width * 4, dtype=self.dtype)(y)
        y = mish(y)
        y = nn.Dense(self.width, dtype=self.dtype)(y)
        return h + y


class SceneTransformerDenoiser(nn.Module):
    """(x [B, A, T, D], cond [B, A, C], t [B], agent_mask [B, A]) ->
    eps/x0 [B, A, T, D]."""

    transition_dim: int = 6
    output_dim: int = 6
    width: int = 128
    num_layers: int = 4
    num_heads: int = 4
    time_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond_feat: jnp.ndarray,
        time: jnp.ndarray,
        agent_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, A, T, D = x.shape
        if agent_mask is None:
            agent_mask = jnp.ones((B, A), dtype=bool)

        t_emb = SinusoidalPosEmb(self.time_dim)(time)  # [B, time_dim]
        t_emb = nn.Dense(self.width, dtype=self.dtype)(t_emb.astype(self.dtype))

        pos_emb = self.param(
            "time_pos_emb", nn.initializers.normal(0.02), (1, 1, T, self.width), self.dtype
        )

        h = nn.Dense(self.width, dtype=self.dtype, name="input_proj")(x.astype(self.dtype))
        c = nn.Dense(self.width, dtype=self.dtype, name="cond_proj")(cond_feat.astype(self.dtype))
        h = h + pos_emb + c[:, :, None, :] + t_emb[:, None, None, :]

        for i in range(self.num_layers):
            h = FactorizedBlock(
                self.width, self.num_heads, dtype=self.dtype, name=f"block{i}"
            )(h, agent_mask)

        h = nn.LayerNorm(dtype=self.dtype)(h)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="output_proj")(h)
        return out * agent_mask[..., None, None]
