"""Trajectory GAN baseline.

Capability parity with the rasterized GAN family
(`/root/reference/src/tbsim/models/rasterized_models.py` GAN model +
`GAN_regularizer.py`, reachable via the GAN algo `algos/algos.py`): a
context-conditioned generator (noise -> action sequence -> unicycle
trajectory) and an MLP discriminator over (scaled trajectory, context),
trained with the least-squares GAN objective.
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


class _TransformerGenerator(nn.Module):
    """Per-timestep token transformer generator (the TransformerGAN
    generator, `algos.py` TransformerGANTrafficModel via
    `models/Transformer.py`): noise+condition seed each timestep token,
    self-attention mixes the horizon, a linear head emits scaled actions."""

    horizon: int
    width: int = 64
    layers: int = 2
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, zc: jnp.ndarray) -> jnp.ndarray:
        B = zc.shape[0]
        seed = nn.Dense(self.width, dtype=self.dtype, name="seed")(zc)  # [B, W]
        t = jnp.arange(self.horizon, dtype=jnp.float32)
        freqs = jnp.exp(
            -jnp.log(10000.0) * jnp.arange(self.width // 2) / (self.width // 2)
        )
        pos = jnp.concatenate(
            [jnp.sin(t[:, None] * freqs[None]), jnp.cos(t[:, None] * freqs[None])],
            axis=-1,
        )  # [T, W]
        h = seed[:, None] + pos[None].astype(self.dtype)  # [B, T, W]
        for i in range(self.layers):
            a = nn.LayerNorm(dtype=self.dtype, name=f"ln_a{i}")(h)
            h = h + nn.SelfAttention(
                num_heads=self.heads, dtype=self.dtype, name=f"attn{i}"
            )(a)
            m = nn.LayerNorm(dtype=self.dtype, name=f"ln_m{i}")(h)
            m = nn.Dense(self.width * 4, dtype=self.dtype, name=f"ff0_{i}")(m)
            h = h + nn.Dense(self.width, dtype=self.dtype, name=f"ff1_{i}")(nn.gelu(m))
        out = nn.Dense(2, dtype=self.dtype, name="head")(h)  # [B, T, 2]
        return out.reshape(B, self.horizon * 2)


class TrajectoryGAN(nn.Module):
    horizon: int = 52
    noise_dim: int = 16
    cond_feat_dim: int = 256
    map_arch: str = "resnet18"
    # "mlp" (rasterized GAN of record) or "transformer"
    # (TransformerGANTrafficModel, `factory.py:68-69`)
    generator_arch: str = "mlp"
    dyn: UnicycleParams = UnicycleParams(
        max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0, acce_hi=8.0
    )
    dt: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.context_encoder = ContextEncoder(
            cond_feat_dim=self.cond_feat_dim, map_arch=self.map_arch, dtype=self.dtype
        )
        if self.generator_arch == "transformer":
            self.generator = _TransformerGenerator(
                horizon=self.horizon, dtype=self.dtype
            )
        else:
            self.generator = MLP(
                self.horizon * 2, layer_dims=(256, 256), normalization=True,
                dtype=self.dtype,
            )
        self.discriminator = MLP(
            1, layer_dims=(256, 256), normalization=True, dtype=self.dtype
        )

    def generate(self, batch: TrafficBatch, num_samp: int = 1, train: bool = False):
        """Noise + context -> [B, N, T, 6] descaled trajectories."""
        aux = self.context_encoder(batch, train=train)
        B = aux["cond_feat"].shape[0]
        z = jax.random.normal(
            self.make_rng("sample"), (B * num_samp, self.noise_dim), self.dtype
        )
        cond = jnp.repeat(aux["cond_feat"], num_samp, axis=0)
        curr = jnp.repeat(aux["curr_states"], num_samp, axis=0)
        actions_scaled = self.generator(
            jnp.concatenate([z, cond], axis=-1)
        ).reshape(-1, self.horizon, 2)
        normalizer = TrajNormalizer()
        actions = normalizer.descale(actions_scaled, [4, 5])
        states = unicycle_forward_dynamics(self.dyn, curr, actions, self.dt)
        traj = jnp.concatenate([states, actions], axis=-1)
        return traj.reshape(B, num_samp, self.horizon, 6), aux

    def discriminate(self, traj_scaled: jnp.ndarray, cond_feat: jnp.ndarray):
        """[B, T, 6] scaled + [B, C] -> logits [B]."""
        flat = traj_scaled.reshape(traj_scaled.shape[0], -1)
        return self.discriminator(jnp.concatenate([flat, cond_feat], axis=-1))[:, 0]

    def __call__(self, batch: TrafficBatch, train: bool = False) -> Dict[str, jnp.ndarray]:
        """LSGAN losses for one batch (generator and discriminator views)."""
        fake_traj, aux = self.generate(batch, num_samp=1, train=train)
        fake_traj = fake_traj[:, 0]
        normalizer = TrajNormalizer()
        fake_scaled = normalizer.scale(fake_traj)
        gt = get_state_and_action_from_batch(batch, self.horizon, self.dt)
        real_scaled = normalizer.scale(gt)

        d_real = self.discriminate(real_scaled, aux["cond_feat"])
        d_fake = self.discriminate(fake_scaled, aux["cond_feat"])

        # least-squares GAN: D pushes real->1, fake->0; G pushes fake->1.
        # Gradient routing happens at the trainer: take grads of d_loss wrt
        # discriminator params and of g_loss wrt generator params.
        # Loss math in f32 even under bf16 network compute (mixed precision)
        d_real = d_real.astype(jnp.float32)
        d_fake = d_fake.astype(jnp.float32)
        d_loss = 0.5 * jnp.mean((d_real - 1.0) ** 2) + 0.5 * jnp.mean(d_fake**2)
        g_loss = 0.5 * jnp.mean((d_fake - 1.0) ** 2)
        return {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "trajectories": fake_traj,
            "d_real_mean": jnp.mean(d_real),
            "d_fake_mean": jnp.mean(d_fake),
        }
