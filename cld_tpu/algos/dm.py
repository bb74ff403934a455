"""Latent DDPM algorithms: training loss, ancestral sampling, transition
log-probability.

Capability parity with `DmModel`
(`/root/reference/models/dm/dm_model.py:82-174`), re-designed functionally:
the denoiser is a flax module applied through its `apply` function, and the
100-step reverse-diffusion loop — a Python `for` in the reference
(`dm_model.py:119-135`) — is a single `lax.scan`, compiled once. The PPO
quantities the reference collects inside the loop (x at t=1, x at t=0, the
final transition's log-prob) are accumulated in the scan carry with masks.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cld_tpu.ops.diffusion import (
    DiffusionSchedule,
    normal_log_prob,
    posterior_mean_logvar,
    predict_start_from_noise,
    q_posterior_mean,
    q_sample,
)

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
# (x [BN, T, D], cond_feat [BN, C], t [BN]) -> eps_hat [BN, T, D]


def dm_loss(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    z0: jnp.ndarray,
    cond_feat: jnp.ndarray,
) -> jnp.ndarray:
    """Epsilon-prediction MSE at uniformly sampled timesteps
    (`dm_model.py:82-89`)."""
    t_rng, noise_rng = jax.random.split(rng)
    batch = z0.shape[0]
    t = jax.random.randint(t_rng, (batch,), 0, schedule.n_timesteps)
    # diffusion/loss math stays f32 even when the VAE encoder/denoiser
    # compute in bf16 (mixed-precision invariant, CLAUDE.md)
    z0 = z0.astype(jnp.float32)
    noise = jax.random.normal(noise_rng, z0.shape, jnp.float32)
    z_noisy = q_sample(schedule, z0, t, noise)
    eps_hat = denoise_fn(z_noisy, cond_feat, t).astype(jnp.float32)
    return jnp.mean((noise - eps_hat) ** 2)


def sample_traj(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    cond_feat: jnp.ndarray,
    horizon: int,
    latent_size: int,
    num_samp: int = 1,
    guidance_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None,
    guidance_stride: int = 1,
    guidance_clean: bool = False,
    guidance_output: bool = False,
    unroll: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Full ancestral sampling as one lax.scan (`dm_model.py:103-142`).

    Args:
        cond_feat: [B, C] conditioning; internally repeated to [B*N, C].
        guidance_fn: optional (x, t) -> perturbed posterior-mean hook used by
            the test-time guidance engine (see cld_tpu.guidance).
        guidance_stride: apply the guidance hook only every k-th denoise step
            (and always at the final steps t < stride) — the reference's
            per-step application stride (`scene_edit_config.py:73-92`
            guidance_optimization_params / apply_guidance_intermediate). A
            lax.cond skips the whole perturbation (decoder + gradient) on
            non-guided steps.
        guidance_clean: the reference's `guide_clean` option
            (`diffuser.py:863-918`): perturb the *clean* x0 reconstruction
            instead of the noisy posterior mean, then rebuild the posterior
            mean from the guided x0 (the principled recompute the reference
            applies in its video_diff branch, `diffuser.py:911-913`).
        guidance_output: perturb the FINAL (t=0) output step too. The
            reference's config of record leaves this off
            (`scene_edit_config.py:85` apply_guidance_output=False /
            `diffuser.py:879-881`: at t==0 guidance applies only when
            apply_guidance_output) — the last denoise step emits the
            unperturbed posterior mean of the already-guided chain.
    Returns dict with:
        pred_traj  [B*N, T, D]  final x_0
        x1         [B*N, T, D]  state recorded after the t==1 transition
        log_prob_final [B*N]    mean elementwise log-prob of the final step
        cond_feat  [B*N, C]     repeated conditioning (for PPO bookkeeping)
    """
    B = cond_feat.shape[0]
    cond = jnp.repeat(cond_feat, num_samp, axis=0)  # [B*N, C]
    BN = B * num_samp

    rng, init_rng = jax.random.split(rng)
    # latents and the scan carry stay float32 even under bf16 conditioning:
    # the schedule buffers are f32 and the posterior math must not round
    x_init = jax.random.normal(init_rng, (BN, horizon, latent_size), jnp.float32)

    steps = jnp.arange(schedule.n_timesteps - 1, -1, -1)
    # Per-step Gaussians are drawn OUTSIDE the scan from the same per-step
    # keys (bitwise-identical to drawing inside the body), so the threefry
    # hash runs once as one batched op instead of sitting on the scan's
    # per-step critical path; [n_steps, BN, T, D] f32 is ~10 MB at bench
    # scale and streams back one ~100 KB slice per step. NOTE the buffer
    # scales linearly with BN = batch * num_samp (~53 MB at the 5-sample
    # closed-loop cadence, more under vmapped/pairwise sharding) — callers
    # pushing num_samp or batch well past those scales should budget HBM
    # accordingly.
    step_noises = jax.vmap(
        lambda k: jax.random.normal(k, (BN, horizon, latent_size), jnp.float32)
    )(jax.random.split(rng, schedule.n_timesteps))

    def body(carry, inp):
        x, x1, logp = carry
        i, noise = inp
        t = jnp.full((BN,), i, dtype=jnp.int32)
        eps_hat = denoise_fn(x, cond, t)
        mean, log_var = posterior_mean_logvar(schedule, x, eps_hat, t)

        def guided_mean(m):
            if guidance_clean:
                x0_hat = predict_start_from_noise(schedule, x, eps_hat, t)
                x0_g = guidance_fn(x0_hat, t)
                return q_posterior_mean(schedule, x0_g, x, t)
            return guidance_fn(m, t)

        if guidance_fn is not None:
            apply = (i % guidance_stride == 0) | (i < guidance_stride) \
                if guidance_stride > 1 else jnp.asarray(True)
            if not guidance_output:
                apply = apply & (i != 0)
            if guidance_stride <= 1 and guidance_output:
                mean = guided_mean(mean)
            else:
                mean = jax.lax.cond(apply, guided_mean, lambda m: m, mean)
        sigma = jnp.exp(0.5 * log_var)
        nonzero = (i != 0).astype(jnp.float32)
        x_next = (mean + nonzero * sigma * noise).astype(jnp.float32)

        x1 = jnp.where(i == 1, x_next, x1)
        step_logp = jnp.mean(
            normal_log_prob(x_next, mean, sigma).astype(jnp.float32), axis=(1, 2)
        )
        logp = jnp.where(i == 0, step_logp, logp)
        return (x_next, x1, logp), None

    init = (x_init, jnp.zeros_like(x_init), jnp.zeros((BN,), jnp.float32))
    # unroll > 1 amortizes per-iteration loop overhead and lets XLA fuse
    # across denoise steps — worthwhile on TPU where each step is small;
    # costs proportionally more compile time (keep 1 on slow-compile links)
    (x0, x1, logp), _ = jax.lax.scan(body, init, (steps, step_noises), unroll=unroll)

    return {"pred_traj": x0, "x1": x1, "log_prob_final": logp, "cond_feat": cond}


def sample_traj_ddim(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    rng: jax.Array,
    cond_feat: jnp.ndarray,
    horizon: int,
    latent_size: int,
    num_samp: int = 1,
    num_steps: int = 50,
    eta: float = 0.0,
    guidance_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """DDIM sampling over a strided timestep subsequence (Song et al.) — the
    fast path for BASELINE config 2 (DDIM-50 open-loop sampling): 2x fewer
    NFE than the DDPM sampler at eta=0 determinism. One lax.scan.
    """
    B = cond_feat.shape[0]
    cond = jnp.repeat(cond_feat, num_samp, axis=0)
    BN = B * num_samp

    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, (BN, horizon, latent_size), jnp.float32)

    # strided subsequence T-1 ... 0 with `num_steps` entries
    ts = jnp.linspace(schedule.n_timesteps - 1, 0, num_steps).round().astype(jnp.int32)
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])
    step_rngs = jax.random.split(rng, num_steps)

    abar = jnp.concatenate([schedule.alphas_cumprod, jnp.ones((1,))])  # abar[-1]=1 via index -1

    def body(x, inp):
        t_i, t_prev, step_rng = inp
        t = jnp.full((BN,), t_i, jnp.int32)
        eps_hat = denoise_fn(x, cond, t).astype(jnp.float32)
        a_t = abar[t_i]
        a_prev = jnp.where(t_prev >= 0, abar[t_prev], 1.0)
        x0_hat = (x - jnp.sqrt(1 - a_t) * eps_hat) / jnp.sqrt(a_t)
        sigma = (
            eta
            * jnp.sqrt((1 - a_prev) / (1 - a_t))
            * jnp.sqrt(1 - a_t / a_prev)
        )
        dir_xt = jnp.sqrt(jnp.clip(1 - a_prev - sigma**2, 0.0)) * eps_hat
        mean = jnp.sqrt(a_prev) * x0_hat + dir_xt
        if guidance_fn is not None:
            mean = guidance_fn(mean, t)
        noise = jax.random.normal(step_rng, x.shape, jnp.float32)
        nonzero = (t_prev >= 0).astype(jnp.float32)
        return (mean + nonzero * sigma * noise).astype(jnp.float32), None

    x, _ = jax.lax.scan(body, x, (ts, ts_prev, step_rngs))
    return {"pred_traj": x, "cond_feat": cond}


def transition_log_prob(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    x_t_minus_1: jnp.ndarray,
    cond_feat: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """log p(x_{t-1} | x_t) under the current denoiser, mean over elements
    (`dm_model.py:165-174`) — the PPO ratio numerator."""
    eps_hat = denoise_fn(x_t, cond_feat, t)
    mean, log_var = posterior_mean_logvar(schedule, x_t, eps_hat, t)
    sigma = jnp.exp(0.5 * log_var)
    return jnp.mean(normal_log_prob(x_t_minus_1, mean, sigma), axis=(1, 2))
