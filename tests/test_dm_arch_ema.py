"""DM trainer: config-selected denoiser arch + EMA shadow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.training.dm import DMTrainer
from cld_tpu.training.vae import VAETrainer
from cld_tpu.utils.registry import get_registered_experiment_config


@pytest.fixture(scope="module")
def setup():
    cfg = get_registered_experiment_config("cld_smoke").unlock()
    batch = synthetic_batch(seed=0, batch_size=2, raster_size=64)
    vae_trainer = VAETrainer(cfg)
    vae_state = vae_trainer.init_state(jax.random.key(0), batch)
    vae_vars = {"params": vae_state.params, "batch_stats": vae_state.batch_stats}
    return cfg, batch, vae_vars


def test_mlp_arch_selectable(setup):
    cfg, batch, vae_vars = setup
    cfg.algo.diffuser_model_arch = "MLPResNetwork"
    trainer = DMTrainer(cfg, vae_vars)
    state = trainer.init_state(jax.random.key(1))
    state, m = trainer.train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))
    cfg.algo.diffuser_model_arch = "nonsense"
    with pytest.raises(ValueError):
        DMTrainer(cfg, vae_vars)
    cfg.algo.diffuser_model_arch = "TemporalMapUnet"


def test_ema_shadow_tracks_params(setup):
    cfg, batch, vae_vars = setup
    cfg.algo.ema_decay = 0.9
    trainer = DMTrainer(cfg, vae_vars)
    state = trainer.init_state(jax.random.key(3))
    assert state.ema_params is not None
    p0 = state.params
    for i in range(3):
        state, _ = trainer.train_step(state, batch, jax.random.key(4))
    # ema lags behind live params but has moved from init
    d_live = max(
        jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, state.params))
    )
    d_ema = max(
        jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, state.ema_params))
    )
    assert 0 < d_ema < d_live
    del cfg.algo["ema_decay"]
