"""Single-latent trajectory CVAE — the classic zoo baseline.

Capability parity with the CVAE family
(`/root/reference/src/tbsim/models/vaes.py:312-600` CVAE/FixedGaussianPrior
and the posterior/condition nets in `base_models.py:858-1124`): a learned
posterior q(z | traj, cond) over ONE latent per trajectory (unlike the CLD
LSTM-VAE's per-timestep latents), a fixed standard-normal prior, and an MLP
decoder producing an action sequence integrated through the unicycle.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.models.context import ContextEncoder
from cld_tpu.models.nets import MLP
from cld_tpu.models.vae import get_state_and_action_from_batch
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics
from cld_tpu.ops.normalization import TrajNormalizer

Dtype = Any


class TrajectoryCVAE(nn.Module):
    horizon: int = 52
    latent_dim: int = 16
    cond_feat_dim: int = 256
    map_arch: str = "resnet18"
    dyn: UnicycleParams = UnicycleParams(
        max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0, acce_hi=8.0
    )
    dt: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.context_encoder = ContextEncoder(
            cond_feat_dim=self.cond_feat_dim, map_arch=self.map_arch, dtype=self.dtype
        )
        self.posterior = MLP(
            2 * self.latent_dim, layer_dims=(256, 256), normalization=True, dtype=self.dtype
        )
        self.decoder = MLP(
            self.horizon * 2, layer_dims=(256, 256), normalization=True, dtype=self.dtype
        )

    def _decode(self, z, cond_feat, curr_states):
        actions_scaled = self.decoder(
            jnp.concatenate([z, cond_feat], axis=-1)
        ).reshape(-1, self.horizon, 2)
        normalizer = TrajNormalizer()
        actions = normalizer.descale(actions_scaled, [4, 5])
        states = unicycle_forward_dynamics(self.dyn, curr_states, actions, self.dt)
        return jnp.concatenate([states, actions], axis=-1)

    def __call__(self, batch: TrafficBatch, beta: float = 0.1, train: bool = False) -> Dict:
        aux = self.context_encoder(batch, train=train)
        gt = get_state_and_action_from_batch(batch, self.horizon, self.dt)
        gt_scaled = TrajNormalizer().scale(gt)
        flat = gt_scaled.reshape(gt.shape[0], -1)
        stats = self.posterior(jnp.concatenate([flat, aux["cond_feat"]], axis=-1))
        mu, logvar = jnp.split(stats, 2, axis=-1)
        std = jnp.exp(0.5 * logvar)
        noise = jnp.zeros_like(std)
        if self.has_rng("sample"):
            noise = jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
        z = mu + noise * std
        traj = self._decode(z, aux["cond_feat"], aux["curr_states"])

        avail = batch.target_availabilities[..., None]
        recon = jnp.mean(avail * (traj[..., :2] - gt[..., :2]) ** 2)
        kld = -0.5 * jnp.mean(jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1))
        return {
            "loss": recon + beta * kld,
            "recon": recon,
            "kld": kld,
            "trajectories": traj,
            "aux_info": aux,
        }

    def sample(self, batch: TrafficBatch, num_samp: int = 1, train: bool = False):
        """Prior samples z ~ N(0, I) -> trajectories [B, N, T, 6]."""
        aux = self.context_encoder(batch, train=train)
        B = aux["cond_feat"].shape[0]
        z = jax.random.normal(
            self.make_rng("sample"), (B * num_samp, self.latent_dim), self.dtype
        )
        cond = jnp.repeat(aux["cond_feat"], num_samp, axis=0)
        curr = jnp.repeat(aux["curr_states"], num_samp, axis=0)
        traj = self._decode(z, cond, curr)
        return traj.reshape(B, num_samp, self.horizon, 6)
