"""Open-loop metric tests; Wasserstein parity vs scipy."""

import numpy as np

from cld_tpu.eval.metrics import ade, fde, realism_deviation, wasserstein_1d


def test_wasserstein_matches_scipy():
    from scipy.stats import wasserstein_distance

    rng = np.random.default_rng(0)
    for _ in range(5):
        a = rng.normal(0, 1, 257)
        b = rng.normal(0.3, 1.4, 123)
        np.testing.assert_allclose(
            wasserstein_1d(a, b), wasserstein_distance(a, b), rtol=1e-10
        )


def test_wasserstein_identical_is_zero():
    a = np.arange(10.0)
    assert wasserstein_1d(a, a) == 0.0


def test_ade_fde():
    gt = np.zeros((2, 5, 2))
    pred = np.zeros((2, 5, 2))
    pred[..., -1, 0] = 3.0
    assert fde(pred, gt) == 3.0
    assert ade(pred, gt) == 3.0 / 5


def test_realism_deviation_keys():
    rng = np.random.default_rng(1)
    stats = {
        "long_acc_gt": rng.normal(0, 1, (4, 52)),
        "long_acc_pred": rng.normal(0, 1, (4, 52)),
        "lat_acc_gt": rng.normal(0, 1, (4, 52)),
        "lat_acc_pred": rng.normal(0, 1, (4, 52)),
    }
    out = realism_deviation(stats)
    assert set(out) == {"wd_long", "wd_lat", "wd_jerk", "realism_deviation"}
    assert out["realism_deviation"] > 0


def test_batch_neg_multi_log_likelihood_matches_reference_math():
    """jnp NLL == the reference's numpy log-sum-exp formulation
    (metrics.py:66-110), re-derived independently here."""
    from cld_tpu.ops.metrics import batch_neg_multi_log_likelihood

    rng = np.random.default_rng(0)
    B, M, T = 3, 4, 6
    gt = rng.normal(size=(B, T, 2)).astype(np.float32)
    pred = rng.normal(size=(B, M, T, 2)).astype(np.float32)
    conf = rng.dirichlet(np.ones(M), size=B).astype(np.float32)
    avails = (rng.random((B, T)) > 0.2).astype(np.float32)

    # golden: straight numpy port of the l5kit formulation
    err = np.sum(((gt[:, None] - pred) * avails[:, None, :, None]) ** 2, axis=-1)
    e = np.log(conf) - 0.5 * np.sum(err, axis=-1)
    mx = e.max(-1, keepdims=True)
    golden = -(np.log(np.exp(e - mx).sum(-1)) + mx[..., 0])

    ours = np.asarray(batch_neg_multi_log_likelihood(gt, pred, conf, avails))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_gmm_loglikelihood_modes():
    """gmm_loglikelihood (metrics.py:549-582): single-component recovery +
    mode aggregation semantics."""
    from cld_tpu.ops.metrics import gmm_loglikelihood

    rng = np.random.default_rng(1)
    B, M, D = 4, 1, 3
    x = rng.normal(size=(B, D)).astype(np.float32)
    m = rng.normal(size=(B, M, D)).astype(np.float32)
    v = np.full((B, M, D), 0.5, np.float32)
    pi = np.ones((B, M), np.float32)

    # single diagonal Gaussian log density, computed directly
    golden = np.sum(
        -0.5 * (np.log(2 * np.pi * v[:, 0]) + (x - m[:, 0]) ** 2 / v[:, 0]), axis=-1
    )
    for mode in ("sum", "mean", "max"):
        np.testing.assert_allclose(
            np.asarray(gmm_loglikelihood(x, m, v, pi, mode=mode)), golden, rtol=1e-5
        )

    # v=None -> unit variance; two identical modes with pi summing to 1
    m2 = np.repeat(m, 2, axis=1)
    pi2 = np.full((B, 2), 0.5, np.float32)
    out = np.asarray(gmm_loglikelihood(x, m2, None, pi2, mode="sum"))
    golden_unit = np.sum(-0.5 * (np.log(2 * np.pi) + (x - m[:, 0]) ** 2), axis=-1)
    np.testing.assert_allclose(out, golden_unit, rtol=1e-5)


def test_reward_kernels():
    import jax.numpy as jnp

    from cld_tpu.algos.reward import compute_reward, failure_rate
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.models.vae import get_state_and_action_from_batch
    from cld_tpu.ops.normalization import TrajNormalizer

    batch = synthetic_batch(seed=3, batch_size=4, raster_size=64)
    gt = get_state_and_action_from_batch(batch)
    scaled = TrajNormalizer().scale(gt)
    # GT trajectories drive on the road: offroad contribution should be 0
    r = compute_reward(gt[:, None], batch, scaled[:, None])
    assert r.shape == (4,)
    rates = failure_rate(gt, batch)
    assert float(rates["offroad_failure_rate"]) == 0.0
    # an off-road trajectory gets penalized
    off = gt.at[..., 1].add(100.0)
    r_off = compute_reward(off[:, None], batch, scaled[:, None])
    assert (np.asarray(r_off) < np.asarray(r)).all()
    rates_off = failure_rate(off, batch)
    assert float(rates_off["offroad_failure_rate"]) == 1.0
