"""Model architecture tests: shapes, parameter structure, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.models.context import ContextEncoder
from cld_tpu.models.lstm import LSTMVAE
from cld_tpu.models.nets import MLP, SinusoidalPosEmb
from cld_tpu.models.resnet import ResNetEncoder
from cld_tpu.models.temporal_unet import TemporalMapUnet
from cld_tpu.models.vae import VaeModel, get_state_and_action_from_batch, vae_loss


@pytest.fixture(scope="module")
def small_batch():
    return synthetic_batch(seed=0, batch_size=2, raster_size=64, horizon=52)


def _param_count(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def test_mlp_structure():
    m = MLP(output_dim=256, layer_dims=(320, 320, 256, 256), normalization=True)
    params = m.init(jax.random.key(0), jnp.zeros((1, 320)))
    out = m.apply(params, jnp.ones((3, 320)))
    assert out.shape == (3, 256)
    # 4 hidden (dense+LN) + 1 output dense
    dense_names = [k for k in params["params"] if k.startswith("dense")]
    assert len(dense_names) == 5


def test_sinusoidal_emb():
    emb = SinusoidalPosEmb(32)
    out = emb.apply({}, jnp.array([0, 50, 99]))
    assert out.shape == (3, 32)
    # t=0: sin part zero, cos part one
    np.testing.assert_allclose(np.asarray(out)[0, :16], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out)[0, 16:], 1.0, atol=1e-7)


def test_resnet18_shapes():
    m = ResNetEncoder(arch="resnet18", feature_dim=256)
    x = jnp.zeros((2, 64, 64, 34))
    params = m.init(jax.random.key(0), x)
    out, mutated = m.apply(params, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 256)
    assert "batch_stats" in mutated
    # eval mode needs no mutation
    out_eval = m.apply(params, x, train=False)
    assert out_eval.shape == (2, 256)
    # parameter count close to torchvision resnet18 (~11.2M conv/bn) + fc
    n = _param_count(params["params"])
    assert 11_000_000 < n < 12_500_000


def test_temporal_unet_shapes():
    m = TemporalMapUnet(transition_dim=4, output_dim=4, dim=32, dim_mults=(2, 4, 8))
    x = jnp.zeros((3, 52, 4))
    cond = jnp.zeros((3, 256))
    t = jnp.zeros((3,), dtype=jnp.int32)
    params = m.init(jax.random.key(0), x, cond, t)
    out = m.apply(params, x, cond, t)
    assert out.shape == (3, 52, 4)


def test_temporal_unet_horizon_52_downsampling():
    """52 -> 26 -> 13 and back up; odd horizons would break skip concat."""
    m = TemporalMapUnet(transition_dim=4, output_dim=4)
    x = jnp.ones((1, 52, 4))
    cond = jnp.ones((1, 256))
    t = jnp.array([5], dtype=jnp.int32)
    params = m.init(jax.random.key(1), x, cond, t)
    out = m.apply(params, x, cond, t)
    assert np.isfinite(np.asarray(out)).all()


def test_lstmvae_shapes_and_rng():
    m = LSTMVAE()
    x = jnp.zeros((2, 52, 6))
    cond = jnp.zeros((2, 256))
    params = m.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x, cond)
    act, mu, logvar = m.apply(params, x, cond, rngs={"sample": jax.random.key(2)})
    assert act.shape == (2, 52, 2)
    assert mu.shape == (2, 52, 4)
    assert logvar.shape == (2, 52, 4)
    # without the sample rng the latent is deterministic (z = mean)
    act2, _, _ = m.apply(params, x, cond)
    act3, _, _ = m.apply(params, x, cond)
    np.testing.assert_array_equal(np.asarray(act2), np.asarray(act3))


def test_context_encoder(small_batch):
    m = ContextEncoder()
    params = m.init(jax.random.key(0), small_batch)
    aux = m.apply(params, small_batch)
    assert aux["cond_feat"].shape == (2, 256)
    assert aux["curr_states"].shape == (2, 4)
    # standardized agent frame: current pos/yaw 0, speed = curr_speed
    np.testing.assert_allclose(
        np.asarray(aux["curr_states"][:, 2]), np.asarray(small_batch.curr_speed)
    )
    np.testing.assert_allclose(np.asarray(aux["curr_states"][:, [0, 1, 3]]), 0.0)


def test_vae_model_end_to_end(small_batch):
    m = VaeModel()
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    params = m.init(rngs, small_batch, 0.05)
    out, _ = m.apply(
        params, small_batch, 0.05, train=True,
        rngs={"sample": jax.random.key(2), "dropout": jax.random.key(3)},
        mutable=["batch_stats"],
    )
    assert out["loss"].shape == ()
    assert out["recon_actions"].shape == (2, 52, 2)
    assert np.isfinite(float(out["loss"]))
    assert float(out["kld"]) >= 0


def test_gt_state_action_consistency(small_batch):
    """GT inverse dynamics recovers the synthetic generator's speeds."""
    sa = get_state_and_action_from_batch(small_batch)
    assert sa.shape == (2, 52, 6)
    np.testing.assert_allclose(
        np.asarray(sa[..., :2]), np.asarray(small_batch.target_positions), atol=1e-5
    )
    # vel channel stays near the generated speed range
    v = np.asarray(sa[..., 2])
    assert (v > 0).all() and (v < 20).all()


def test_vae_loss_zero_when_perfect():
    gt = jnp.zeros((2, 52, 6))
    recon = jnp.zeros((2, 52, 2))
    mu = jnp.zeros((2, 52, 4))
    logvar = jnp.zeros((2, 52, 4))
    loss, recon_l, kld = vae_loss(gt, recon, mu, logvar, beta=0.1)
    assert float(recon_l) == 0.0
    assert float(kld) == 0.0
