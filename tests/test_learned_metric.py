"""EBM learned-metric tests: shapes, InfoNCE trains, scoring API."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.models.learned_metric import PermuteEBM, ebm_infonce_loss


def test_ebm_score_matrix_and_loss():
    batch = synthetic_batch(seed=0, batch_size=3, raster_size=64)
    m = PermuteEBM(map_feature_dim=16, traj_feature_dim=16, embedding_dim=16)
    params = m.init(jax.random.key(0), batch)
    out = m.apply(params, batch)
    assert out["scores"].shape == (3, 3)
    loss = ebm_infonce_loss(out["scores"])
    assert np.isfinite(float(loss))
    scores = m.apply(params, batch, method="get_scores")
    assert scores.shape == (3,)
    # matched scores equal the diagonal of the permutation matrix
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(jnp.diag(out["scores"])), atol=1e-4
    )


def test_ebm_trains_to_prefer_matched_pairs():
    batch = synthetic_batch(seed=1, batch_size=4, raster_size=64)
    m = PermuteEBM(map_feature_dim=16, traj_feature_dim=16, embedding_dim=16)
    variables = m.init(jax.random.key(0), batch)

    def loss_fn(p):
        out, _ = m.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
        )
        return ebm_infonce_loss(out["scores"])

    opt = optax.adam(1e-3)
    p = variables["params"]
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
