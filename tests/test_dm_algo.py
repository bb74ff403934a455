"""Latent DDPM algorithm tests: loss, sampling scan, log-prob consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.algos.dm import dm_loss, sample_traj, transition_log_prob
from cld_tpu.models.temporal_unet import TemporalMapUnet
from cld_tpu.ops.diffusion import make_schedule, normal_log_prob, posterior_mean_logvar


@pytest.fixture(scope="module")
def unet_setup():
    unet = TemporalMapUnet(transition_dim=4, output_dim=4, dim=8, dim_mults=(2, 4, 8))
    x = jnp.zeros((2, 52, 4))
    cond = jnp.zeros((2, 32))
    t = jnp.zeros((2,), dtype=jnp.int32)
    params = unet.init(jax.random.key(0), x, cond, t)

    def denoise_fn(x, c, t):
        return unet.apply(params, x, c, t)

    return denoise_fn


def test_dm_loss_finite(unet_setup):
    sch = make_schedule(100)
    z0 = jax.random.normal(jax.random.key(1), (2, 52, 4))
    cond = jax.random.normal(jax.random.key(2), (2, 32))
    loss = dm_loss(unet_setup, sch, jax.random.key(3), z0, cond)
    assert loss.shape == ()
    assert np.isfinite(float(loss))


def test_sample_traj_shapes_and_determinism(unet_setup):
    sch = make_schedule(10)  # short schedule for speed
    cond = jax.random.normal(jax.random.key(4), (2, 32))
    out = jax.jit(
        lambda rng: sample_traj(unet_setup, sch, rng, cond, 52, 4, num_samp=3)
    )(jax.random.key(5))
    assert out["pred_traj"].shape == (6, 52, 4)
    assert out["x1"].shape == (6, 52, 4)
    assert out["log_prob_final"].shape == (6,)
    assert out["cond_feat"].shape == (6, 32)
    assert np.isfinite(np.asarray(out["pred_traj"])).all()
    # same rng -> identical samples (up to jit-fusion reassociation)
    out2 = sample_traj(unet_setup, sch, jax.random.key(5), cond, 52, 4, num_samp=3)
    np.testing.assert_allclose(
        np.asarray(out["pred_traj"]), np.asarray(out2["pred_traj"]), rtol=1e-3, atol=1e-3
    )
    # at t=0 the sampler adds no noise, so x0 == posterior mean and the
    # recorded final-step log-prob is exactly the density peak value
    sigma0 = float(jnp.exp(0.5 * sch.posterior_log_variance_clipped[0]))
    expected_logp = -np.log(sigma0) - 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(
        np.asarray(out["log_prob_final"]), expected_logp, rtol=1e-5
    )


def test_final_step_is_deterministic_mean(unet_setup):
    """At t=0 no noise is added: x0 equals the posterior mean of x1."""
    sch = make_schedule(10)
    cond = jax.random.normal(jax.random.key(6), (1, 32))
    out = sample_traj(unet_setup, sch, jax.random.key(7), cond, 52, 4)
    t0 = jnp.zeros((1,), dtype=jnp.int32)
    eps_hat = unet_setup(out["x1"], out["cond_feat"], t0)
    mean, _ = posterior_mean_logvar(sch, out["x1"], eps_hat, t0)
    np.testing.assert_allclose(
        np.asarray(out["pred_traj"]), np.asarray(mean), atol=1e-5
    )


def test_sample_traj_unroll_invariant(unet_setup):
    """Scan unrolling is a pure scheduling knob (bench.py defaults to
    unroll=2): samples, x1 and log-probs must match the unroll=1 program
    up to jit-fusion reassociation."""
    sch = make_schedule(10)
    cond = jax.random.normal(jax.random.key(4), (2, 32))
    outs = {
        u: jax.jit(
            lambda rng, u=u: sample_traj(
                unet_setup, sch, rng, cond, 52, 4, num_samp=2, unroll=u
            )
        )(jax.random.key(11))
        for u in (1, 2)
    }
    for key in ("pred_traj", "x1", "log_prob_final"):
        np.testing.assert_allclose(
            np.asarray(outs[2][key]), np.asarray(outs[1][key]),
            rtol=1e-3, atol=1e-3, err_msg=key,
        )


def test_guidance_hook_applied(unet_setup):
    """A guidance_fn shifting the mean must shift the samples."""
    sch = make_schedule(10)
    cond = jnp.zeros((1, 32))
    base = sample_traj(unet_setup, sch, jax.random.key(8), cond, 52, 4)

    def shift(mean, t):
        return mean + 0.5

    guided = sample_traj(
        unet_setup, sch, jax.random.key(8), cond, 52, 4, guidance_fn=shift
    )
    diff = np.asarray(guided["pred_traj"]) - np.asarray(base["pred_traj"])
    assert np.abs(diff).mean() > 0.1


def test_transition_log_prob_matches_manual(unet_setup):
    sch = make_schedule(100)
    rng = jax.random.key(9)
    x_t = jax.random.normal(rng, (2, 52, 4))
    x_tm1 = x_t + 0.01
    cond = jnp.zeros((2, 32))
    t = jnp.array([3, 60], dtype=jnp.int32)
    got = transition_log_prob(unet_setup, sch, x_t, x_tm1, cond, t)
    eps_hat = unet_setup(x_t, cond, t)
    mean, log_var = posterior_mean_logvar(sch, x_t, eps_hat, t)
    expected = jnp.mean(
        normal_log_prob(x_tm1, mean, jnp.exp(0.5 * log_var)), axis=(1, 2)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5)
