"""DDPM math: cosine schedule and all derived coefficient buffers.

Capability parity with the reference's schedule construction
(`/root/reference/src/tbsim/models/diffuser_helpers.py:451-462` and
`/root/reference/models/dm/dm_model.py:29-56`). The schedule is computed in
float64 on the host exactly as the reference does (numpy), then frozen into
float32 device constants — they are compile-time constants under jit, so
every `extract(buf, t)` becomes a cheap gather fused into the sampler scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine beta schedule (Nichol & Dhariwal), replicated including the
    reference's linspace endpoint convention (`diffuser_helpers.py:451-462`)."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


class DiffusionSchedule(NamedTuple):
    """All DDPM coefficient buffers (mirrors `dm_model.py:29-56`).

    Each field is a [n_timesteps] float32 array; index with a per-sample
    timestep vector via `extract`.
    """

    n_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # coefficients of the epsilon-parameterized posterior mean:
    #   mu = x_t_cof * x_t - noise_cof * eps_hat
    x_t_cof: jnp.ndarray
    noise_cof: jnp.ndarray


def make_schedule(n_timesteps: int = 100, s: float = 0.008) -> DiffusionSchedule:
    betas = cosine_beta_schedule(n_timesteps, s=s)  # float64 host math
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([np.ones(1), alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    def f32(a):
        return jnp.asarray(a, dtype=jnp.float32)

    return DiffusionSchedule(
        n_timesteps=int(n_timesteps),
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.clip(posterior_variance, 1e-20, None))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        x_t_cof=f32(np.sqrt(1.0 / alphas)),
        noise_cof=f32(betas / np.sqrt(alphas - alphas_cumprod * alphas)),
    )


def extract(buf: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample coefficients and broadcast to an ndim-rank tensor
    (`diffuser_helpers.py:446-449`): buf[t] -> [B, 1, ..., 1]."""
    out = buf[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def q_sample(
    schedule: DiffusionSchedule, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Forward-noise x0 to step t (`dm_model.py:91-96`)."""
    return (
        extract(schedule.sqrt_alphas_cumprod, t, x0.ndim) * x0
        + extract(schedule.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise
    )


def posterior_mean_logvar(
    schedule: DiffusionSchedule, x_t: jnp.ndarray, eps_hat: jnp.ndarray, t: jnp.ndarray
):
    """Epsilon-parameterized reverse-step mean and log-variance
    (`dm_model.py:157-163`)."""
    mean = (
        extract(schedule.x_t_cof, t, x_t.ndim) * x_t
        - extract(schedule.noise_cof, t, eps_hat.ndim) * eps_hat
    )
    log_var = extract(schedule.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, log_var


def predict_start_from_noise(
    schedule: DiffusionSchedule, x_t: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """x0_hat from the epsilon prediction (`diffuser.py:718-724`
    predict_start_from_noise)."""
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - extract(schedule.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def q_posterior_mean(
    schedule: DiffusionSchedule, x0: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Posterior mean q(x_{t-1} | x_t, x0) parameterized by the clean sample
    (`diffuser.py:726-738` q_posterior)."""
    return (
        extract(schedule.posterior_mean_coef1, t, x0.ndim) * x0
        + extract(schedule.posterior_mean_coef2, t, x_t.ndim) * x_t
    )


def normal_log_prob(x: jnp.ndarray, mean: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Normal log-density (torch.distributions.Normal.log_prob)."""
    var = sigma**2
    return -((x - mean) ** 2) / (2 * var) - jnp.log(sigma) - 0.5 * np.log(2 * np.pi)
