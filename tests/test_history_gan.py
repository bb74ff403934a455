"""History encoders + GAN baseline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.models.gan import TrajectoryGAN
from cld_tpu.models.history_encoders import (
    AgentHistoryEncoder,
    NeighborHistoryEncoder,
    prepare_hist_in,
)


def test_prepare_hist_in_zeroes_unavailable():
    B, T = 2, 5
    pos = jnp.ones((B, T, 2))
    yaw = jnp.zeros((B, T, 1))
    speed = jnp.full((B, T), 3.0)
    extent = jnp.tile(jnp.array([4.0, 2.0, 1.7]), (B, 1))
    avail = jnp.ones((B, T)).at[0, 0].set(0.0)
    out = prepare_hist_in(pos, yaw, speed, extent, avail,
                          np.zeros(5), np.ones(5)).reshape(B, T, 8)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0)
    assert float(out[0, 1, 4]) == 3.0  # speed channel survives where avail


def test_agent_history_encoder_shapes():
    enc = AgentHistoryEncoder(num_steps=10, out_dim=32)
    B, T = 3, 10
    args = (
        jnp.zeros((B, T, 2)), jnp.zeros((B, T, 1)), jnp.zeros((B, T)),
        jnp.ones((B, 3)), jnp.ones((B, T)),
    )
    params = enc.init(jax.random.key(0), *args)
    out = enc.apply(params, *args)
    assert out.shape == (3, 32)


def test_neighbor_encoder_masks_empty_neighbors():
    enc = NeighborHistoryEncoder(num_steps=6, out_dim=16)
    B, Q, T = 2, 4, 6
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0, 5, (B, Q, T, 2)).astype(np.float32))
    yaw = jnp.zeros((B, Q, T, 1))
    speed = jnp.zeros((B, Q, T))
    extent = jnp.ones((B, Q, 3))
    avail = jnp.ones((B, Q, T)).at[0, 2:].set(0.0)  # batch 0: only 2 valid
    params = enc.init(jax.random.key(1), pos, yaw, speed, extent, avail)
    out = enc.apply(params, pos, yaw, speed, extent, avail)
    assert out.shape == (B, 16)
    assert np.isfinite(np.asarray(out)).all()
    # garbage in masked neighbors doesn't change the pooled encoding
    pos2 = pos.at[0, 3].set(1e6)
    out2 = enc.apply(params, pos2, yaw, speed, extent, avail)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]), atol=1e-5)
    # all-empty scene pools to zeros, not -inf
    out3 = enc.apply(params, pos, yaw, speed, extent, jnp.zeros((B, Q, T)))
    np.testing.assert_allclose(np.asarray(out3), 0.0)


def test_gan_losses_and_generation():
    batch = synthetic_batch(seed=0, batch_size=2, raster_size=64)
    m = TrajectoryGAN(cond_feat_dim=32, noise_dim=8)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    params = m.init(rngs, batch)
    out, _ = m.apply(
        params, batch, train=True, rngs={"sample": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    for k in ("d_loss", "g_loss"):
        assert np.isfinite(float(out[k]))
    assert out["trajectories"].shape == (2, 52, 6)
    samples, _ = m.apply(
        params, batch, 4, method="generate", rngs={"sample": jax.random.key(3)}
    )
    assert samples.shape == (2, 4, 52, 6)
    spread = np.asarray(samples[..., -1, :2]).std(axis=1).mean()
    assert spread > 1e-4  # noise produces diverse futures


def test_gan_trainer_alternating_updates():
    from cld_tpu.training.gan import GANTrainer, _split_params
    from cld_tpu.utils.registry import get_registered_experiment_config

    cfg = get_registered_experiment_config("cld_smoke")
    batch = synthetic_batch(seed=2, batch_size=2, raster_size=64)
    trainer = GANTrainer(cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    g0, d0 = _split_params(state.params)
    for i in range(3):
        state, m = trainer.train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    g1, d1 = _split_params(state.params)
    # both subtrees moved
    dg = max(jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g0, g1)))
    dd = max(jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), d0, d1)))
    assert dg > 0 and dd > 0
    assert int(state.step) == 3
