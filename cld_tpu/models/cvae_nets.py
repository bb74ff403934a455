"""CVAE building-block networks.

Capability parity with the CVAE machinery in
`/root/reference/src/tbsim/models/base_models.py`: `SplitMLP:114` /
`MIMOMLP:178` (dict-out / dict-in-dict-out MLPs), `RNNTrajectoryEncoder:813`,
`PosteriorEncoder:858` (x, c -> q params via an RNN trajectory encoder),
`ScenePosteriorEncoder:891` (per-agent features + attention + masked
aggregation), `ConditionEncoder:935` / `ConditionNet:1095` /
`ConditionDecoder:1114`, and `MLPTrajectoryDecoder:1257` (z, c -> action
sequence -> dynamics-integrated trajectory). These complete the base-model
inventory the TrajectoryCVAE/DiscreteCVAE baselines draw from (the flat-MLP
posterior in models/cvae.py is the reference's `PosteriorNet:1071` form;
this module adds the RNN/scene forms)."""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cld_tpu.models.lstm import LSTMEncoder
from cld_tpu.models.nets import MLP
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics
from cld_tpu.ops.normalization import TrajNormalizer

Dtype = Any


class SplitMLP(nn.Module):
    """MLP whose flat output is split into named heads
    (`base_models.py:114-176`). output_shapes: name -> trailing shape."""

    output_shapes: Mapping[str, Tuple[int, ...]]
    layer_dims: Sequence[int] = (128, 128)
    normalization: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        import math

        sizes = {k: math.prod(s) for k, s in self.output_shapes.items()}
        total = sum(sizes.values())
        flat = MLP(total, layer_dims=tuple(self.layer_dims),
                   normalization=self.normalization, dtype=self.dtype)(x)
        out, ofs = {}, 0
        for k, s in self.output_shapes.items():
            out[k] = flat[..., ofs:ofs + sizes[k]].reshape(x.shape[:-1] + tuple(s))
            ofs += sizes[k]
        return out


class MIMOMLP(nn.Module):
    """Dict-in dict-out MLP (`base_models.py:178-232`): named inputs are
    flattened + concatenated, then SplitMLP."""

    output_shapes: Mapping[str, Tuple[int, ...]]
    layer_dims: Sequence[int] = (128, 128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        flat = jnp.concatenate(
            [inputs[k].reshape(inputs[k].shape[0], -1) for k in sorted(inputs)], axis=-1
        )
        return SplitMLP(self.output_shapes, self.layer_dims, dtype=self.dtype)(flat)


class RNNTrajectoryEncoder(nn.Module):
    """Trajectory -> last RNN hidden state (`base_models.py:813-841`)."""

    rnn_hidden_size: int = 100
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, traj: jnp.ndarray) -> jnp.ndarray:
        cond = jnp.zeros((traj.shape[0], self.rnn_hidden_size), self.dtype)
        h = LSTMEncoder(hidden_size=self.rnn_hidden_size, num_layers=1,
                        dropout_rate=0.0, dtype=self.dtype)(traj, cond)
        return h[:, -1]


class PosteriorEncoder(nn.Module):
    """(x trajectories, condition feats) -> named q params
    (`base_models.py:858-890`)."""

    output_shapes: Mapping[str, Tuple[int, ...]]
    mlp_layer_dims: Sequence[int] = (128, 128)
    rnn_hidden_size: int = 100
    normalization: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, trajectories: jnp.ndarray, condition_features: jnp.ndarray):
        traj_feat = RNNTrajectoryEncoder(self.rnn_hidden_size, self.dtype)(trajectories)
        feat = jnp.concatenate([traj_feat, condition_features], axis=-1)
        return SplitMLP(self.output_shapes, self.mlp_layer_dims,
                        normalization=self.normalization, dtype=self.dtype)(feat)


class ScenePosteriorEncoder(nn.Module):
    """Scene-level posterior: per-agent (traj, cond) features, one
    self-attention mixing pass, masked max/mean aggregation over agents
    (`base_models.py:891-933`)."""

    output_shapes: Mapping[str, Tuple[int, ...]]
    aggregate_func: str = "max"
    mlp_layer_dims: Sequence[int] = (128, 128)
    rnn_hidden_size: int = 100
    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        trajectories: jnp.ndarray,  # [B, Na, T, D]
        condition_features: jnp.ndarray,  # [B, Na, C]
        mask: jnp.ndarray,  # [B, Na] bool: real agents
    ):
        B, Na = trajectories.shape[:2]
        traj_feat = RNNTrajectoryEncoder(self.rnn_hidden_size, self.dtype)(
            trajectories.reshape(B * Na, *trajectories.shape[2:])
        ).reshape(B, Na, -1)
        feat = jnp.concatenate([traj_feat, condition_features], axis=-1)
        D = feat.shape[-1]
        Dh = -(-D // self.num_heads) * self.num_heads  # head-divisible width
        attn_mask = (mask[:, None, None, :] & mask[:, None, :, None])
        mixed = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=Dh, out_features=D,
            dtype=self.dtype,
        )(feat, feat, mask=attn_mask)
        feat = feat + mixed
        neg = jnp.finfo(jnp.float32).min
        if self.aggregate_func == "max":
            agg = jnp.where(mask[..., None], feat, neg).max(axis=1)
        elif self.aggregate_func == "mean":
            m = mask[..., None].astype(feat.dtype)
            agg = (feat * m).sum(1) / jnp.clip(m.sum(1), 1e-6)
        else:
            raise ValueError(self.aggregate_func)
        return SplitMLP(self.output_shapes, self.mlp_layer_dims, dtype=self.dtype)(agg)


class ConditionNet(nn.Module):
    """Named condition inputs -> one condition feature
    (`base_models.py:1095-1112`)."""

    condition_dim: int
    mlp_layer_dims: Sequence[int] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        out = MIMOMLP({"feat": (self.condition_dim,)}, self.mlp_layer_dims,
                      dtype=self.dtype)(inputs)
        return nn.relu(out["feat"])


class ConditionDecoder(nn.Module):
    """(z, c) -> decoder(concat) (`base_models.py:1114-1123`)."""

    decoder: nn.Module

    def __call__(self, latents: jnp.ndarray, condition_features: jnp.ndarray, **kw):
        return self.decoder(jnp.concatenate([latents, condition_features], axis=-1), **kw)


class MLPTrajectoryDecoder(nn.Module):
    """Feature -> action sequence -> dynamics-integrated trajectory
    (`base_models.py:1125-1303` TrajectoryDecoder/MLPTrajectoryDecoder,
    `forward_dynamics` unicycle branch). With dynamics enabled the network
    predicts (acc, yawvel) and the unicycle integrates; without, it predicts
    raw states."""

    horizon: int
    state_dim: int = 3
    layer_dims: Sequence[int] = (128, 128)
    use_dynamics: bool = True
    dt: float = 0.1
    dyn: UnicycleParams = UnicycleParams(
        max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0, acce_hi=8.0
    )
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, curr_states: Optional[jnp.ndarray] = None):
        if self.use_dynamics:
            assert curr_states is not None
            raw = MLP(self.horizon * 2, layer_dims=tuple(self.layer_dims),
                      dtype=self.dtype)(feat)
            actions = TrajNormalizer().descale(
                raw.reshape(-1, self.horizon, 2), [4, 5]
            )
            states = unicycle_forward_dynamics(self.dyn, curr_states, actions, self.dt)
            return {"trajectories": jnp.concatenate([states, actions], axis=-1),
                    "controls": actions}
        raw = MLP(self.horizon * self.state_dim, layer_dims=tuple(self.layer_dims),
                  dtype=self.dtype)(feat)
        return {"trajectories": raw.reshape(-1, self.horizon, self.state_dim)}
