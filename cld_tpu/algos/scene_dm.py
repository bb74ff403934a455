"""Scene-centric diffusion: joint denoising of all agents in a scene.

Capability parity with `SceneDiffuserModel`
(`/root/reference/src/tbsim/models/scenediffuser.py:38`, the CTG++ algo
`SceneDiffuserTrafficModel`, `algos/algos.py:2307`): diffusion over
[B, A, T, D] scene tensors with a transformer denoiser
(cld_tpu.models.scene_transformer), padding agents masked throughout.
Training and sampling mirror the latent DM but keep the agent axis.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from cld_tpu.ops.diffusion import (
    DiffusionSchedule,
    posterior_mean_logvar,
    q_sample,
)

SceneDenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
# (x [B, A, T, D], cond [B, A, C], t [B], agent_mask [B, A]) -> eps_hat


def scene_dm_loss(
    denoise_fn: SceneDenoiseFn,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    x0: jnp.ndarray,
    cond_feat: jnp.ndarray,
    agent_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked eps-MSE over the scene tensor."""
    t_rng, n_rng = jax.random.split(rng)
    B = x0.shape[0]
    t = jax.random.randint(t_rng, (B,), 0, schedule.n_timesteps)
    noise = jax.random.normal(n_rng, x0.shape, x0.dtype)
    x_noisy = q_sample(schedule, x0, t, noise)
    eps_hat = denoise_fn(x_noisy, cond_feat, t, agent_mask)
    w = agent_mask[..., None, None].astype(x0.dtype)
    return jnp.sum(w * (noise - eps_hat) ** 2) / jnp.clip(
        jnp.sum(w) * x0.shape[-2] * x0.shape[-1], 1.0
    )


def scene_sample(
    denoise_fn: SceneDenoiseFn,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    cond_feat: jnp.ndarray,
    agent_mask: jnp.ndarray,
    horizon: int,
    transition_dim: int,
    guidance_fn: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """Ancestral sampling over scene tensors as one lax.scan."""
    B, A, _ = cond_feat.shape
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, (B, A, horizon, transition_dim), jnp.float32)
    steps = jnp.arange(schedule.n_timesteps - 1, -1, -1)
    step_rngs = jax.random.split(rng, schedule.n_timesteps)

    def body(x, inp):
        i, step_rng = inp
        t = jnp.full((B,), i, jnp.int32)
        eps_hat = denoise_fn(x, cond_feat, t, agent_mask)
        mean, log_var = posterior_mean_logvar(schedule, x, eps_hat, t)
        if guidance_fn is not None:
            mean = guidance_fn(mean, t)
        sigma = jnp.exp(0.5 * log_var)
        noise = jax.random.normal(step_rng, x.shape, jnp.float32)
        nonzero = (i != 0).astype(jnp.float32)
        x_next = (mean + nonzero * sigma * noise).astype(jnp.float32)
        return x_next * agent_mask[..., None, None], None

    x, _ = jax.lax.scan(body, x, (steps, step_rngs))
    return {"pred_traj": x}
