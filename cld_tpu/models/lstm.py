"""Conditional LSTM-VAE over state+action trajectories.

Capability parity with `/root/reference/models/vae/lstm_vae.py:6-99`:

* 2-layer LSTM encoder over the scaled [B, T, 6] state+action trajectory,
  condition feature injected as the initial hidden state of every layer via
  a Dense projection (`cond2hidden`), cell states zero-initialized;
* per-timestep latent heads mu/logvar: [B, T, latent_size];
* 2-layer LSTM decoder mapping the latent sequence back to the [B, T, 2]
  action sequence, conditioned the same way;
* dropout 0.2 between LSTM layers at train time.

TPU notes: each layer is a `flax.linen.RNN` (lax.scan over time) with an
explicit initial carry. T=52 is tiny, so the sequential scan costs little;
the batch dimension carries the parallelism and shards over the mesh.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class _CondLSTMStack(nn.Module):
    """num_layers LSTMs; h0 of every layer = Dense(cond), c0 = 0.

    `scan_unroll` unrolls the time scan: the cells are tiny ([B, 64]
    matmuls), so per-iteration loop overhead dominates on TPU — this
    matters most for the guided sampler, where the decoder (and its
    backward) runs inside every one of the 100 denoise steps."""

    hidden_size: int
    num_layers: int = 2
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32
    scan_unroll: int = 13  # divisor of the T=52 horizon: 4 scan iterations

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cond: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        batch = x.shape[0]
        h0 = nn.Dense(self.hidden_size, dtype=self.dtype, name="cond2hidden")(
            cond.astype(self.dtype)
        )
        c0 = jnp.zeros((batch, self.hidden_size), dtype=self.dtype)
        y = x.astype(self.dtype)
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype, name=f"lstm_{i}")
            y = nn.RNN(cell, unroll=self.scan_unroll, name=f"rnn_{i}")(
                y, initial_carry=(c0, h0)
            )
            if i < self.num_layers - 1 and self.dropout_rate > 0:
                y = nn.Dropout(self.dropout_rate, name=f"dropout_{i}")(
                    y, deterministic=deterministic
                )
        return y


class LSTMEncoder(nn.Module):
    """Trajectory -> per-timestep hidden states (`lstm_vae.py:6-26`)."""

    hidden_size: int = 64
    num_layers: int = 2
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, deterministic: bool = True):
        return _CondLSTMStack(
            self.hidden_size, self.num_layers, self.dropout_rate, self.dtype, name="stack"
        )(x, cond, deterministic)


class LSTMDecoder(nn.Module):
    """Latent sequence -> action sequence (`lstm_vae.py:28-51`)."""

    hidden_size: int = 64
    output_size: int = 2
    num_layers: int = 2
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, cond, deterministic: bool = True):
        h = _CondLSTMStack(
            self.hidden_size, self.num_layers, self.dropout_rate, self.dtype, name="stack"
        )(z, cond, deterministic)
        return nn.Dense(self.output_size, dtype=self.dtype, name="hid2act")(h)


class LSTMVAE(nn.Module):
    """Conditional sequence VAE (`lstm_vae.py:54-99`).

    Methods: `__call__` (full recon path), `traj2z` (encode+reparametrize),
    `decode`. The reparametrization noise comes from the 'sample' RNG
    collection.
    """

    input_size: int = 6
    hidden_size: int = 64
    latent_size: int = 4
    output_size: int = 2
    num_layers: int = 2
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.lstm_enc = LSTMEncoder(
            self.hidden_size, self.num_layers, self.dropout_rate, self.dtype
        )
        self.lstm_dec = LSTMDecoder(
            self.hidden_size, self.output_size, self.num_layers, self.dropout_rate, self.dtype
        )
        self.mu = nn.Dense(self.latent_size, dtype=self.dtype)
        self.logvar = nn.Dense(self.latent_size, dtype=self.dtype)

    def __call__(
        self, x: jnp.ndarray, cond: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        z, mean, logvar = self.traj2z(x, cond, deterministic)
        act = self.lstm_dec(z, cond, deterministic)
        return act, mean, logvar

    def traj2z(self, x, cond, deterministic: bool = True):
        h = self.lstm_enc(x, cond, deterministic)  # [B, T, H]
        mean = self.mu(h)  # [B, T, L]
        logvar = self.logvar(h)
        std = jnp.exp(0.5 * logvar)
        noise = jnp.zeros_like(std)
        if self.has_rng("sample"):
            import jax

            noise = jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
        z = mean + noise * std
        return z, mean, logvar

    def decode(self, z, cond, deterministic: bool = True):
        return self.lstm_dec(z, cond, deterministic)
