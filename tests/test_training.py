"""Training-stage tests: VAE/DM steps improve loss; PPO buffer + update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.training.dm import DMTrainer
from cld_tpu.training.ppo import PPOTrainer, buffer_add, buffer_init
from cld_tpu.training.state import BetaSchedule, warmup_cosine_by_epoch
from cld_tpu.training.vae import VAETrainer
from cld_tpu.utils.config import default_config


def tiny_config():
    cfg = default_config()
    cfg.algo.curr_state_feat_dim = 16
    cfg.algo.map_feature_dim = 32
    cfg.algo.cond_feat_dim = 32
    cfg.algo.base_dim = 8
    cfg.algo.vae.hidden_size = 16
    cfg.algo.n_diffusion_steps = 5
    cfg.train.training.batch_size = 2
    # one step per "epoch" so the 10-epoch LR warmup passes quickly
    # (epoch 0 has lr factor 0, faithfully mirroring the reference LambdaLR)
    cfg.train.training.steps_per_epoch = 1
    cfg.train.training.epochs = 40
    cfg.env.rasterizer.raster_size = 64
    cfg.algo.buffer_max = 64
    cfg.algo.ppo_update_times = 2
    cfg.algo.ppo_epochs = 2
    cfg.algo.ppo_mini_batch = 4
    return cfg


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(seed=0, batch_size=2, raster_size=64)


@pytest.fixture(scope="module")
def vae_setup(cfg, batch):
    trainer = VAETrainer(cfg)
    state = trainer.init_state(jax.random.key(0), batch)
    return trainer, state


def test_beta_schedule():
    b = BetaSchedule()
    assert float(b(jnp.array(0))) == pytest.approx(0.05)
    assert float(b(jnp.array(9000))) == pytest.approx(0.3, abs=1e-6)
    assert float(b(jnp.array(100000))) == pytest.approx(0.3)


def test_lr_schedule_epoch_granularity():
    sched = warmup_cosine_by_epoch(1e-4, total_epochs=20, steps_per_epoch=10)
    # within epoch 0 the lr is constant at 0 (warmup from epoch 0/10)
    assert float(sched(jnp.array(0))) == 0.0
    assert float(sched(jnp.array(9))) == 0.0
    # epoch 5 -> factor 0.5
    assert float(sched(jnp.array(50))) == pytest.approx(0.5e-4)
    # after warmup, cosine decays to 0 at the last epoch
    assert float(sched(jnp.array(100))) == pytest.approx(1e-4)
    assert float(sched(jnp.array(199))) < 1e-4


def test_vae_train_step_improves(vae_setup, batch):
    trainer, state = vae_setup
    rng = jax.random.key(1)
    state1, m0 = trainer.train_step(state, batch, rng)
    for _ in range(14):
        state1, m = trainer.train_step(state1, batch, rng)
    assert float(m["recon"]) < float(m0["recon"])
    assert np.isfinite(float(m["loss"]))
    assert int(state1.step) == 15


def test_vae_eval_step(vae_setup, batch):
    trainer, state = vae_setup
    m = trainer.eval_step(state, batch)
    assert np.isfinite(float(m["loss"]))


@pytest.fixture(scope="module")
def dm_setup(cfg, batch, vae_setup):
    _, vae_state = vae_setup
    vae_vars = {"params": vae_state.params, "batch_stats": vae_state.batch_stats}
    trainer = DMTrainer(cfg, vae_vars)
    state = trainer.init_state(jax.random.key(2))
    return trainer, state


def test_dm_train_step_improves(dm_setup, batch):
    trainer, state = dm_setup
    rng = jax.random.key(3)
    state1, m0 = trainer.train_step(state, batch, rng)
    for _ in range(10):
        state1, m = trainer.train_step(state1, batch, rng)
    assert float(m["loss"]) < float(m0["loss"])


def test_dm_sample_shapes(dm_setup, batch):
    trainer, state = dm_setup
    out = trainer.sample(state, batch, jax.random.key(4), num_samp=2)
    assert out["pred_traj"].shape == (4, 52, 4)
    assert out["cond_feat"].shape == (4, 32)


def test_buffer_ring_semantics():
    buf = buffer_init(capacity=8, horizon=4, latent=2, cond_dim=3)
    x = jnp.ones((5, 4, 2))
    buf = buffer_add(buf, x, x, jnp.ones(5), jnp.full(5, 2.0), jnp.ones((5, 3)))
    assert int(buf.size) == 5 and int(buf.ptr) == 5
    assert float(buf.baseline) == pytest.approx(2.0)  # first add sets baseline
    # second add wraps around and EMAs the baseline
    buf = buffer_add(buf, 3 * x, x, jnp.ones(5), jnp.full(5, 4.0), jnp.ones((5, 3)))
    assert int(buf.size) == 8 and int(buf.ptr) == 2
    assert float(buf.baseline) == pytest.approx(0.9 * 2.0 + 0.1 * 4.0)
    # slots 5,6,7,0,1 hold the new entries
    np.testing.assert_allclose(np.asarray(buf.x0[5]), 3.0)
    np.testing.assert_allclose(np.asarray(buf.x0[1]), 3.0)
    np.testing.assert_allclose(np.asarray(buf.x0[2]), 1.0)


def test_ppo_collect_and_update(cfg, batch, dm_setup):
    trainer_dm, dm_state = dm_setup
    ppo = PPOTrainer(cfg, trainer_dm)
    buf = buffer_init(
        cfg.algo.buffer_max, cfg.algo.horizon, cfg.algo.vae.latent_size,
        cfg.algo.cond_feat_dim,
    )
    buf, metrics = ppo.collect_step(dm_state, buf, batch, jax.random.key(5))
    assert int(buf.size) == 2  # B * num_samp
    assert np.isfinite(float(metrics["reward"]))
    new_state, pm = ppo.ppo_update(dm_state, buf, jax.random.key(6))
    assert np.isfinite(float(pm["loss"]))
    # PPO health stats present and sane
    assert 0.0 <= float(pm["clip_fraction"]) <= 1.0
    assert np.isfinite(float(pm["ratio_mean"]))
    assert np.isfinite(float(pm["approx_kl"]))
    # params actually moved
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), dm_state.params, new_state.params
    )
    assert max(jax.tree.leaves(diff)) > 0
    assert int(new_state.step) == int(dm_state.step) + 4  # 2 epochs x 2 iters


def test_ppo_test_step(cfg, batch, dm_setup):
    trainer_dm, dm_state = dm_setup
    ppo = PPOTrainer(cfg, trainer_dm)
    rates, stats = ppo.test_step(dm_state, batch, jax.random.key(7))
    for v in rates.values():
        assert 0.0 <= float(v) <= 1.0
    assert stats["long_acc_pred"].shape == (2, 52)
