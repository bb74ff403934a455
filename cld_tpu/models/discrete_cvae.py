"""Discrete-latent trajectory CVAE.

Capability parity with `DiscreteCVAE`
(`/root/reference/src/tbsim/models/vaes.py:463+`): a categorical latent over
K behavior modes with a Gumbel-softmax relaxation at train time, a learned
conditional prior p(z|cond), and per-mode trajectory decoding — the
multimodal baseline of the zoo.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.models.context import ContextEncoder
from cld_tpu.models.nets import MLP
from cld_tpu.models.vae import get_state_and_action_from_batch
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics
from cld_tpu.ops.normalization import TrajNormalizer

Dtype = Any


class DiscreteTrajectoryCVAE(nn.Module):
    horizon: int = 52
    num_modes: int = 8
    cond_feat_dim: int = 256
    map_arch: str = "resnet18"
    temperature: float = 1.0
    dyn: UnicycleParams = UnicycleParams(
        max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0, acce_hi=8.0
    )
    dt: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.context_encoder = ContextEncoder(
            cond_feat_dim=self.cond_feat_dim, map_arch=self.map_arch, dtype=self.dtype
        )
        self.posterior = MLP(self.num_modes, layer_dims=(256,), normalization=True,
                             dtype=self.dtype)
        self.prior = MLP(self.num_modes, layer_dims=(128,), normalization=True,
                         dtype=self.dtype)
        self.decoder = MLP(self.horizon * 2, layer_dims=(256, 256),
                           normalization=True, dtype=self.dtype)

    def _decode(self, z_onehot, cond_feat, curr_states):
        actions_scaled = self.decoder(
            jnp.concatenate([z_onehot, cond_feat], axis=-1)
        ).reshape(-1, self.horizon, 2)
        actions = TrajNormalizer().descale(actions_scaled, [4, 5])
        states = unicycle_forward_dynamics(self.dyn, curr_states, actions, self.dt)
        return jnp.concatenate([states, actions], axis=-1)

    def __call__(self, batch: TrafficBatch, beta: float = 1.0, train: bool = False) -> Dict:
        aux = self.context_encoder(batch, train=train)
        gt = get_state_and_action_from_batch(batch, self.horizon, self.dt)
        gt_scaled = TrajNormalizer().scale(gt)
        flat = gt_scaled.reshape(gt.shape[0], -1)

        q_logits = self.posterior(jnp.concatenate([flat, aux["cond_feat"]], axis=-1))
        p_logits = self.prior(aux["cond_feat"])

        if train and self.has_rng("sample"):
            g = -jnp.log(-jnp.log(
                jax.random.uniform(self.make_rng("sample"), q_logits.shape, minval=1e-9, maxval=1.0)
            ))
            z = jax.nn.softmax((q_logits + g) / self.temperature, axis=-1)
        else:
            z = jax.nn.one_hot(jnp.argmax(q_logits, axis=-1), self.num_modes)

        traj = self._decode(z, aux["cond_feat"], aux["curr_states"])
        avail = batch.target_availabilities[..., None]
        recon = jnp.mean(avail * (traj[..., :2] - gt[..., :2]) ** 2)
        # KL(q || p) between categoricals
        q = jax.nn.softmax(q_logits, axis=-1)
        kld = jnp.mean(
            jnp.sum(q * (jax.nn.log_softmax(q_logits) - jax.nn.log_softmax(p_logits)), axis=-1)
        )
        return {"loss": recon + beta * kld, "recon": recon, "kld": kld,
                "trajectories": traj, "q_logits": q_logits, "p_logits": p_logits}

    def sample_modes(self, batch: TrafficBatch, train: bool = False) -> jnp.ndarray:
        """Decode every prior mode -> [B, K, T, 6] multimodal futures."""
        aux = self.context_encoder(batch, train=train)
        B = aux["cond_feat"].shape[0]
        K = self.num_modes
        z = jnp.tile(jnp.eye(K), (B, 1))  # [B*K, K]
        cond = jnp.repeat(aux["cond_feat"], K, axis=0)
        curr = jnp.repeat(aux["curr_states"], K, axis=0)
        traj = self._decode(z, cond, curr)
        return traj.reshape(B, K, self.horizon, 6)
