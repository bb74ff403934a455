"""Vector agent/neighbor history encoders.

Capability parity with `AgentHistoryEncoder` / `NeighborHistoryEncoder`
(`/root/reference/src/tbsim/models/diffuser_helpers.py:106-296`) and the
feature assembly `prepare_hist_in` (`:69-104`): the non-rasterized history
conditioning path used by the CTG diffuser — each agent's past states become
an (x, y, hx, hy, s, l, w, avail) vector per step, flattened through an MLP;
neighbors are encoded individually and max-pooled with -inf padding.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cld_tpu.models.nets import MLP

Dtype = Any


def prepare_hist_in(
    pos: jnp.ndarray,
    yaw: jnp.ndarray,
    speed: jnp.ndarray,
    extent: jnp.ndarray,
    avail: jnp.ndarray,
    add_coeffs: np.ndarray,
    div_coeffs: np.ndarray,
) -> jnp.ndarray:
    """[B, T, ...] history -> flat [B, T*8] feature (x, y, hx, hy, s, l, w,
    avail) with unavailable steps zeroed (`diffuser_helpers.py:69-104`)."""
    B, T, _ = pos.shape
    hvec = jnp.concatenate([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
    lw = jnp.broadcast_to(extent[:, None, :2], (B, T, 2))
    add = jnp.asarray(add_coeffs, jnp.float32)
    div = jnp.asarray(div_coeffs, jnp.float32)
    pos_n = (pos + add[:2]) / div[:2]
    speed_n = (speed[..., None] + add[2]) / div[2]
    lw_n = (lw + add[3:]) / div[3:]
    feats = jnp.concatenate(
        [pos_n, hvec, speed_n, lw_n, avail[..., None]], axis=-1
    )  # [B, T, 8]
    feats = jnp.where(avail[..., None] > 0, feats, 0.0)
    return feats.reshape(B, -1)


class AgentHistoryEncoder(nn.Module):
    """Flattened-history MLP encoder (`diffuser_helpers.py:106-146`)."""

    num_steps: int
    out_dim: int = 128
    norm_add: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.0)
    norm_div: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pos, yaw, speed, extent, avail) -> jnp.ndarray:
        net_in = prepare_hist_in(
            pos, yaw, speed, extent, avail,
            np.asarray(self.norm_add), np.asarray(self.norm_div),
        )
        input_dim = self.num_steps * 8
        return MLP(
            self.out_dim,
            layer_dims=(input_dim, input_dim, self.out_dim, self.out_dim),
            normalization=True,
            dtype=self.dtype,
            name="traj_mlp",
        )(net_in)


class NeighborHistoryEncoder(nn.Module):
    """Per-neighbor encoding + availability-masked max pool
    (`diffuser_helpers.py:173-296`)."""

    num_steps: int
    out_dim: int = 128
    norm_add: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.0)
    norm_div: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pos, yaw, speed, extent, avail) -> jnp.ndarray:
        """pos [B, Q, T, 2], ... -> [B, out_dim]."""
        B, Q, T, _ = pos.shape
        enc = AgentHistoryEncoder(
            self.num_steps, self.out_dim, self.norm_add, self.norm_div,
            self.dtype, name="agt_hist_encoder",
        )(
            pos.reshape(B * Q, T, 2),
            yaw.reshape(B * Q, T, 1),
            speed.reshape(B * Q, T),
            extent.reshape(B * Q, 3),
            avail.reshape(B * Q, T),
        ).reshape(B, Q, -1)
        # neighbors with no valid step are -inf so max-pool ignores them
        has_any = jnp.any(avail > 0, axis=-1)  # [B, Q]
        enc = jnp.where(has_any[..., None], enc, -jnp.inf)
        pooled = jnp.max(enc, axis=1)
        # scenes with zero neighbors pool to 0, not -inf
        return jnp.where(jnp.isfinite(pooled), pooled, 0.0)
