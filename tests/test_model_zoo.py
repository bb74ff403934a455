"""Model zoo: MLP denoiser, BC planner, trajectory CVAE, scene transformer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.models.bc import BCPlanner
from cld_tpu.models.cvae import TrajectoryCVAE
from cld_tpu.models.dm_mlp import MLPResDenoiser
from cld_tpu.models.scene_transformer import SceneTransformerDenoiser


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(seed=0, batch_size=2, raster_size=64)


def test_mlp_denoiser_drop_in():
    """Same signature as TemporalMapUnet; works in the DM sampler."""
    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.ops.diffusion import make_schedule

    m = MLPResDenoiser(horizon=52, transition_dim=4, width=64, num_blocks=2)
    x = jnp.zeros((2, 52, 4))
    c = jnp.zeros((2, 16))
    t = jnp.zeros((2,), jnp.int32)
    params = m.init(jax.random.key(0), x, c, t)
    out = m.apply(params, x, c, t)
    assert out.shape == (2, 52, 4)
    samp = sample_traj(
        lambda x, c, t: m.apply(params, x, c, t), make_schedule(5),
        jax.random.key(1), c, 52, 4,
    )
    assert samp["pred_traj"].shape == (2, 52, 4)


def test_bc_planner_trains(batch):
    m = BCPlanner(cond_feat_dim=32, map_arch="resnet18")
    params = m.init(jax.random.key(0), batch)

    import optax

    def loss_fn(p):
        out, _ = m.apply(
            {"params": p, "batch_stats": params["batch_stats"]},
            batch, train=True, method="loss", mutable=["batch_stats"],
        )
        return out["loss"]

    opt = optax.adam(1e-3)
    p = params["params"]
    state = opt.init(p)
    l0 = None
    step = jax.jit(jax.value_and_grad(loss_fn))
    for i in range(8):
        l, g = step(p)
        updates, state = opt.update(g, state)
        p = optax.apply_updates(p, updates)
        if l0 is None:
            l0 = float(l)
    assert float(l) < l0


def test_cvae_elbo_and_sampling(batch):
    m = TrajectoryCVAE(latent_dim=8, cond_feat_dim=32)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    params = m.init(rngs, batch, 0.1)
    out, _ = m.apply(
        params, batch, 0.1, train=True,
        rngs={"sample": jax.random.key(2)}, mutable=["batch_stats"],
    )
    assert np.isfinite(float(out["loss"]))
    assert float(out["kld"]) >= 0
    assert out["trajectories"].shape == (2, 52, 6)
    samples = m.apply(
        params, batch, 3, method="sample", rngs={"sample": jax.random.key(3)}
    )
    assert samples.shape == (2, 3, 52, 6)
    # prior samples are diverse
    spread = np.asarray(samples[..., -1, :2]).std(axis=1).mean()
    assert spread > 1e-3


def test_scene_transformer_shapes_and_masking():
    m = SceneTransformerDenoiser(transition_dim=6, output_dim=6, width=32, num_layers=2)
    B, A, T = 2, 5, 52
    x = jax.random.normal(jax.random.key(0), (B, A, T, 6))
    cond = jax.random.normal(jax.random.key(1), (B, A, 16))
    t = jnp.array([3, 7])
    mask = jnp.ones((B, A), bool).at[:, -2:].set(False)  # 2 padding agents
    params = m.init(jax.random.key(2), x, cond, t, mask)
    out = m.apply(params, x, cond, t, mask)
    assert out.shape == (B, A, T, 6)
    # padded agents produce zero output
    np.testing.assert_allclose(np.asarray(out[:, -2:]), 0.0)
    # padded agents do not influence real agents
    x2 = x.at[:, -1].set(999.0)
    out2 = m.apply(params, x2, cond, t, mask)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(out2[:, :3]), atol=1e-5)


def test_scene_transformer_time_attention_sees_sequence():
    """Changing one timestep of one agent changes its other timesteps'
    outputs (temporal attention works)."""
    m = SceneTransformerDenoiser(width=32, num_layers=2)
    B, A, T = 1, 2, 8
    x = jnp.zeros((B, A, T, 6))
    cond = jnp.zeros((B, A, 16))
    t = jnp.zeros((B,), jnp.int32)
    params = m.init(jax.random.key(0), x, cond, t)
    out0 = m.apply(params, x, cond, t)
    out1 = m.apply(params, x.at[0, 0, 3].set(5.0), cond, t)
    diff_other_steps = np.abs(np.asarray(out1[0, 0, [0, 1, 2, 4]]) - np.asarray(out0[0, 0, [0, 1, 2, 4]]))
    assert diff_other_steps.max() > 1e-6
