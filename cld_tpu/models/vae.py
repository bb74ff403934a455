"""VaeModel: context encoder + LSTM-VAE + unicycle decoding, with losses.

Capability parity with `/root/reference/models/vae/vae_model.py:12-173`:
`pre_vae` builds the conditioning feature and the z-normalized GT
state+action trajectory; the VAE reconstructs the action sequence; actions
are integrated through the unicycle to a full state+action trajectory; the
loss is action-MSE + beta * KLD/(B*T).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.models.context import ContextEncoder
from cld_tpu.models.lstm import LSTMVAE
from cld_tpu.ops.dynamics import (
    UnicycleParams,
    convert_state_to_state_and_action,
    unicycle_forward_dynamics,
)
from cld_tpu.ops.normalization import TrajNormalizer

Dtype = Any


def get_state_and_action_from_batch(
    batch: TrafficBatch, horizon: int = 52, dt: float = 0.1
) -> jnp.ndarray:
    """GT [B, T, 6] state+action via inverse unicycle dynamics
    (`models/context_utils.py:64-70`)."""
    traj_state = jnp.concatenate(
        [batch.target_positions[:, :horizon], batch.target_yaws[:, :horizon]], axis=-1
    )
    return convert_state_to_state_and_action(traj_state, batch.curr_speed, dt)


def convert_action_to_state_and_action(
    actions: jnp.ndarray,
    curr_states: jnp.ndarray,
    dyn_params: UnicycleParams,
    normalizer: TrajNormalizer,
    dt: float = 0.1,
    scaled_input: bool = True,
    descaled_output: bool = False,
) -> jnp.ndarray:
    """Integrate (scaled) actions through the unicycle into a (scaled)
    state+action trajectory (`vae_model.py:100-129`). Handles [B, T, 2] and
    [B, N, T, 2]."""
    squeeze = False
    if actions.ndim == 4:
        B, N, T, _ = actions.shape
        actions = actions.reshape(B * N, T, -1)
        squeeze = (B, N, T)
    if scaled_input:
        actions = normalizer.descale(actions, [4, 5])
    states = unicycle_forward_dynamics(dyn_params, curr_states, actions, dt)
    out = jnp.concatenate([states, actions], axis=-1)
    if scaled_input and not descaled_output:
        out = normalizer.scale(out)
    if squeeze:
        B, N, T = squeeze
        out = out.reshape(B, N, T, -1)
    return out


def vae_loss(
    gt_scaled: jnp.ndarray, recon_actions: jnp.ndarray, mu: jnp.ndarray,
    logvar: jnp.ndarray, beta: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Action-MSE + beta * KLD/(B*T) (`vae_model.py:89-99`). Loss math is
    f32 regardless of the network compute dtype (bf16-mixed training keeps
    f32 loss/grad accumulation, like the reference's '16-mixed')."""
    recon_actions = recon_actions.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    recon = jnp.mean((gt_scaled.astype(jnp.float32)[..., -2:] - recon_actions) ** 2)
    B, T, _ = mu.shape
    kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar)) / (B * T)
    return recon + beta * kld, recon, kld


class VaeModel(nn.Module):
    """Flax module owning the context encoder and the LSTM-VAE.

    The dynamics integration and normalization are parameter-free pure
    functions (see module-level helpers); only the networks live here.
    """

    curr_state_feat_dim: int = 64
    map_feature_dim: int = 256
    cond_feat_dim: int = 256
    map_arch: str = "resnet18"
    vae_hidden_size: int = 64
    vae_latent_size: int = 4
    horizon: int = 52
    dt: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.context_encoder = ContextEncoder(
            curr_state_feat_dim=self.curr_state_feat_dim,
            map_feature_dim=self.map_feature_dim,
            cond_feat_dim=self.cond_feat_dim,
            map_arch=self.map_arch,
            dtype=self.dtype,
        )
        self.lstmvae = LSTMVAE(
            input_size=6,
            hidden_size=self.vae_hidden_size,
            latent_size=self.vae_latent_size,
            output_size=2,
            dtype=self.dtype,
        )

    def pre_vae(self, batch: TrafficBatch, train: bool = False):
        """-> (aux_info, gt_state_and_action_scaled, gt_state_and_action)
        (`vae_model.py:83-87`)."""
        aux_info = self.context_encoder(batch, train=train)
        normalizer = TrajNormalizer()
        sa = get_state_and_action_from_batch(batch, self.horizon, self.dt)
        return aux_info, normalizer.scale(sa), sa

    def __call__(self, batch: TrafficBatch, beta: float, train: bool = False) -> Dict:
        aux_info, gt_scaled, _ = self.pre_vae(batch, train=train)
        recon_actions, mu, logvar = self.lstmvae(
            gt_scaled, aux_info["cond_feat"], deterministic=not train
        )
        loss, recon, kld = vae_loss(gt_scaled, recon_actions, mu, logvar, beta)
        return {
            "loss": loss,
            "recon": recon,
            "kld": kld,
            "recon_actions": recon_actions,
            "aux_info": aux_info,
        }

    def encode(self, batch: TrafficBatch, train: bool = False):
        """batch -> (z, mu, logvar, aux_info): the frozen-VAE latent target
        used by DM training (`dm_trainer.py:72-80`)."""
        aux_info, gt_scaled, _ = self.pre_vae(batch, train=train)
        z, mu, logvar = self.lstmvae.traj2z(
            gt_scaled, aux_info["cond_feat"], deterministic=not train
        )
        return z, mu, logvar, aux_info

    def decode(self, z: jnp.ndarray, cond_feat: jnp.ndarray, train: bool = False):
        """Latents -> scaled action sequence."""
        return self.lstmvae.decode(z, cond_feat, deterministic=not train)


def decode_actions(vae, variables, z, cond_feat, impl: str = "auto"):
    """Latents -> scaled actions through either the flax module
    (``impl="flax"``) or the fused pallas LSTM stack (ops/lstm_pallas.py;
    ``"auto"`` = pallas on TPU, jnp scan elsewhere). The fused path is
    VJP-exact in every argument, so callers that differentiate through the
    decoder (guidance perturbation, latent PPO) can use it unchanged."""
    if impl == "flax":
        return vae.apply(variables, z, cond_feat, method="decode")
    from cld_tpu.ops.lstm_pallas import fused_decode_actions

    return fused_decode_actions(variables, z, cond_feat, impl=impl)
