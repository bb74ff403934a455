"""Transformer predictor + discrete CVAE tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.models.discrete_cvae import DiscreteTrajectoryCVAE
from cld_tpu.models.transformer_baseline import TransformerTrajectoryPredictor


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(seed=0, batch_size=2, raster_size=64)


def test_transformer_predictor_trains(batch):
    m = TransformerTrajectoryPredictor(width=32, num_layers=1)
    params = m.init(jax.random.key(0), batch)

    def loss_fn(p):
        return m.apply(p, batch, method="loss")["loss"]

    opt = optax.adam(1e-3)
    p = params
    state = opt.init(p)
    step = jax.jit(jax.value_and_grad(loss_fn))
    l0 = None
    for _ in range(10):
        l, g = step(p)
        updates, state = opt.update(g, state)
        p = optax.apply_updates(p, updates)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0
    out = m.apply(p, batch)
    assert out["trajectories"].shape == (2, 52, 6)
    # dynamics consistency baked in
    assert np.isfinite(np.asarray(out["trajectories"])).all()


def test_transformer_uses_history(batch):
    m = TransformerTrajectoryPredictor(width=32, num_layers=1)
    params = m.init(jax.random.key(1), batch)
    out1 = m.apply(params, batch)
    batch2 = batch._replace(history_positions=batch.history_positions + 3.0)
    out2 = m.apply(params, batch2)
    assert np.abs(
        np.asarray(out1["trajectories"]) - np.asarray(out2["trajectories"])
    ).max() > 1e-5


def test_discrete_cvae_elbo_and_modes(batch):
    m = DiscreteTrajectoryCVAE(num_modes=4, cond_feat_dim=32)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    params = m.init(rngs, batch)
    out, _ = m.apply(
        params, batch, train=True, rngs={"sample": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(out["loss"]))
    assert float(out["kld"]) >= -1e-5
    assert out["q_logits"].shape == (2, 4)
    modes = m.apply(params, batch, method="sample_modes")
    assert modes.shape == (2, 4, 52, 6)
    # modes decode to distinct futures
    spread = np.asarray(modes[..., -1, :2]).std(axis=1).mean()
    assert spread > 1e-4
