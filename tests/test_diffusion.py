"""DDPM schedule and posterior math tests (golden values vs independent numpy)."""

import numpy as np
import jax.numpy as jnp

from cld_tpu.ops.diffusion import (
    cosine_beta_schedule,
    extract,
    make_schedule,
    normal_log_prob,
    posterior_mean_logvar,
    q_sample,
)


def test_cosine_schedule_golden():
    """Independent re-derivation of the reference formula
    (diffuser_helpers.py:451-462) with the linspace(0, steps, steps) endpoint
    convention."""
    n = 100
    betas = cosine_beta_schedule(n)
    assert betas.shape == (n,)
    s = 0.008
    steps = n + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    expected = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
    np.testing.assert_allclose(betas, expected, rtol=1e-12)
    assert (betas > 0).all() and (betas <= 0.999).all()
    assert betas[-1] == 0.999  # cosine schedule saturates at the clip


def test_schedule_buffer_identities():
    sch = make_schedule(100)
    alphas = 1.0 - np.asarray(sch.betas, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(sch.alphas_cumprod), np.cumprod(alphas), rtol=1e-4
    )
    # noise_cof == betas / (sqrt(alphas) * sqrt(1 - alphas_cumprod))
    expected = np.asarray(sch.betas) / (
        np.sqrt(alphas) * np.sqrt(1 - np.asarray(sch.alphas_cumprod, dtype=np.float64))
    )
    np.testing.assert_allclose(np.asarray(sch.noise_cof), expected, rtol=1e-4)
    # posterior variance telescopes: beta_t * (1-abar_{t-1})/(1-abar_t)
    pv = np.asarray(sch.betas) * (1 - np.asarray(sch.alphas_cumprod_prev)) / (
        1 - np.asarray(sch.alphas_cumprod)
    )
    np.testing.assert_allclose(np.asarray(sch.posterior_variance), pv, rtol=1e-4)


def test_q_sample_interpolates():
    sch = make_schedule(100)
    x0 = jnp.ones((2, 4, 3))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 99])
    out = np.asarray(q_sample(sch, x0, t, noise))
    np.testing.assert_allclose(out[0], np.asarray(sch.sqrt_alphas_cumprod)[0], rtol=1e-6)
    np.testing.assert_allclose(out[1], np.asarray(sch.sqrt_alphas_cumprod)[99], rtol=1e-6)


def test_extract_broadcast():
    buf = jnp.arange(10.0)
    t = jnp.array([3, 7])
    out = extract(buf, t, 4)
    assert out.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [3.0, 7.0])


def test_posterior_mean_matches_epsilon_form():
    """mu = (1/sqrt(a_t)) * (x_t - beta_t/sqrt(1-abar_t) * eps)."""
    sch = make_schedule(100)
    rng = np.random.default_rng(0)
    x_t = jnp.asarray(rng.normal(size=(5, 6, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(5, 6, 4)).astype(np.float32))
    t = jnp.array([0, 10, 50, 80, 99])
    mean, log_var = posterior_mean_logvar(sch, x_t, eps, t)
    a = np.asarray(sch.betas)[np.asarray(t)]
    alphas = 1 - a
    abar = np.asarray(sch.alphas_cumprod)[np.asarray(t)]
    expected = (1 / np.sqrt(alphas))[:, None, None] * (
        np.asarray(x_t) - (a / np.sqrt(1 - abar))[:, None, None] * np.asarray(eps)
    )
    np.testing.assert_allclose(np.asarray(mean), expected, rtol=1e-3, atol=1e-5)
    assert log_var.shape == (5, 1, 1)


def test_normal_log_prob_matches_scipy():
    from scipy.stats import norm

    rng = np.random.default_rng(1)
    x = rng.normal(size=(100,))
    mu = rng.normal(size=(100,))
    sigma = rng.uniform(0.1, 2.0, size=(100,))
    got = np.asarray(normal_log_prob(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(sigma)))
    expected = norm.logpdf(x, mu, sigma)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
