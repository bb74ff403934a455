"""Seq2seq transformer trajectory predictor.

Capability parity with the reference's transformer baseline
(`/root/reference/src/tbsim/models/Transformer.py:20-860` seq2seq model and
`transformer_model.py`, reachable via the TransformerTrafficModel algo): a
transformer encoder over the (vector) history tokens + context, decoded
into the future trajectory. TPU-first simplification: a non-autoregressive
query decoder — learned future-time queries cross-attend to the encoded
history — so inference is one parallel pass instead of T sequential decode
steps (no autoregressive scan on the critical path).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.models.nets import mish
from cld_tpu.models.vae import get_state_and_action_from_batch
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics

Dtype = Any


class EncoderBlock(nn.Module):
    width: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype
        )(y, y, mask=mask)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype)(y)
        y = mish(y)
        y = nn.Dense(self.width, dtype=self.dtype)(y)
        return x + y


class DecoderBlock(nn.Module):
    width: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv):
        y = nn.LayerNorm(dtype=self.dtype)(q)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_attn"
        )(y, y)
        q = q + y
        y = nn.LayerNorm(dtype=self.dtype)(q)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="cross_attn"
        )(y, kv)
        q = q + y
        y = nn.LayerNorm(dtype=self.dtype)(q)
        y = nn.Dense(self.width * 4, dtype=self.dtype)(y)
        y = mish(y)
        y = nn.Dense(self.width, dtype=self.dtype)(y)
        return q + y


class TransformerTrajectoryPredictor(nn.Module):
    """History tokens -> future action sequence -> unicycle trajectory."""

    horizon: int = 52
    width: int = 64
    num_layers: int = 2
    num_heads: int = 4
    dyn: UnicycleParams = UnicycleParams(
        max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0, acce_hi=8.0
    )
    dt: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: TrafficBatch, train: bool = False) -> Dict[str, jnp.ndarray]:
        # history tokens: (x, y, cos/sin yaw, avail) per past step
        hist = jnp.concatenate(
            [
                batch.history_positions,
                jnp.cos(batch.history_yaws),
                jnp.sin(batch.history_yaws),
                batch.history_availabilities[..., None],
            ],
            axis=-1,
        )  # [B, Th, 5]
        B, Th, _ = hist.shape
        tok = nn.Dense(self.width, dtype=self.dtype, name="hist_proj")(hist.astype(self.dtype))
        tok = tok + self.param(
            "hist_pos_emb", nn.initializers.normal(0.02), (1, Th, self.width), self.dtype
        )
        for i in range(self.num_layers):
            tok = EncoderBlock(self.width, self.num_heads, self.dtype, name=f"enc{i}")(tok)

        q = jnp.broadcast_to(
            self.param(
                "future_queries", nn.initializers.normal(0.02),
                (1, self.horizon, self.width), self.dtype,
            ),
            (B, self.horizon, self.width),
        )
        for i in range(self.num_layers):
            q = DecoderBlock(self.width, self.num_heads, self.dtype, name=f"dec{i}")(q, tok)
        actions = nn.Dense(2, dtype=self.dtype, name="action_head")(q)

        states = unicycle_forward_dynamics(
            self.dyn, get_current_states(batch), actions, self.dt
        )
        return {"trajectories": jnp.concatenate([states, actions], axis=-1)}

    def loss(self, batch: TrafficBatch, train: bool = False) -> Dict[str, jnp.ndarray]:
        out = self(batch, train=train)
        gt = get_state_and_action_from_batch(batch, self.horizon, self.dt)
        avail = batch.target_availabilities[..., None]
        traj = out["trajectories"]
        pos_loss = jnp.mean(avail * (traj[..., :2] - gt[..., :2]) ** 2)
        yaw_loss = jnp.mean(avail * (traj[..., 3:4] - gt[..., 3:4]) ** 2)
        return {"loss": pos_loss + yaw_loss, "trajectories": traj}
