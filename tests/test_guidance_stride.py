"""Guidance stride: skipping perturbation on non-guided steps."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.algos.dm import sample_traj
from cld_tpu.ops.diffusion import make_schedule


def test_stride_applies_subset_of_steps():
    sch = make_schedule(10)
    dn = lambda x, c, t: jnp.zeros_like(x)
    cond = jnp.zeros((1, 8))

    def shift(mean, t):
        return mean + 1.0

    full = sample_traj(dn, sch, jax.random.key(0), cond, 8, 4,
                       guidance_fn=shift, guidance_stride=1)
    strided = sample_traj(dn, sch, jax.random.key(0), cond, 8, 4,
                          guidance_fn=shift, guidance_stride=3)
    none = sample_traj(dn, sch, jax.random.key(0), cond, 8, 4)
    d_full = float(jnp.abs(full["pred_traj"] - none["pred_traj"]).mean())
    d_strided = float(jnp.abs(strided["pred_traj"] - none["pred_traj"]).mean())
    assert d_strided > 0.1  # guidance still applied on some steps
    assert d_strided < d_full  # but fewer of them


def test_stride_jits():
    sch = make_schedule(10)
    dn = lambda x, c, t: jnp.zeros_like(x)
    cond = jnp.zeros((2, 8))
    out = jax.jit(
        lambda r: sample_traj(dn, sch, r, cond, 8, 4,
                              guidance_fn=lambda m, t: m * 0.9,
                              guidance_stride=4)
    )(jax.random.key(1))
    assert np.isfinite(np.asarray(out["pred_traj"])).all()
