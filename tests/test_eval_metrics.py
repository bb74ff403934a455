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
