"""Pallas kernels vs jnp reference oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.ops.pallas_kernels import (
    disk_collision_penalty_pallas,
    disk_collision_penalty_ref,
    offroad_count_pallas,
    offroad_count_ref,
)

INTERPRET = jax.default_backend() != "tpu"


def test_offroad_count_matches_ref():
    rng = np.random.default_rng(0)
    B, P, H, W = 4, 52, 64, 64
    drivable = (rng.random((B, H, W)) > 0.4).astype(np.float32)
    pix = rng.integers(0, 64, (B, P, 2)).astype(np.int32)
    ref = np.asarray(offroad_count_ref(jnp.asarray(pix), jnp.asarray(drivable)))
    got = np.asarray(
        offroad_count_pallas(jnp.asarray(pix), jnp.asarray(drivable), interpret=INTERPRET)
    )
    np.testing.assert_allclose(got, ref)


def test_offroad_count_all_on_road():
    drivable = jnp.ones((2, 32, 32))
    pix = jnp.zeros((2, 10, 2), jnp.int32)
    got = np.asarray(offroad_count_pallas(pix, drivable, interpret=INTERPRET))
    np.testing.assert_allclose(got, 0.0)


def test_disk_collision_matches_ref():
    rng = np.random.default_rng(1)
    T, B, D = 8, 6, 4
    cent = rng.normal(0, 5, (T, B, D, 2)).astype(np.float32)
    rad = rng.uniform(0.8, 1.2, B).astype(np.float32)
    pen = rad[:, None] + rad[None, :] + 0.2
    mask = ~np.eye(B, dtype=bool)
    decay = (0.9 ** np.arange(T)).astype(np.float32)
    decay /= decay.sum()
    ref = np.asarray(
        disk_collision_penalty_ref(
            jnp.asarray(cent), jnp.asarray(pen), jnp.asarray(mask), jnp.asarray(decay)
        )
    )
    got = np.asarray(
        disk_collision_penalty_pallas(
            jnp.asarray(cent), jnp.asarray(pen), jnp.asarray(mask), jnp.asarray(decay),
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert ref.max() > 0  # the random scene does contain collisions


def test_disk_collision_no_overlap_zero():
    T, B, D = 4, 3, 2
    cent = np.zeros((T, B, D, 2), np.float32)
    cent[:, :, :, 0] += np.arange(B)[None, :, None] * 100.0  # far apart
    pen = np.full((B, B), 2.0, np.float32)
    mask = ~np.eye(B, dtype=bool)
    decay = np.full(T, 1.0 / T, np.float32)
    got = np.asarray(
        disk_collision_penalty_pallas(
            jnp.asarray(cent), jnp.asarray(pen), jnp.asarray(mask), jnp.asarray(decay),
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, 0.0)


def test_drivable_gather_pallas_matches_ref():
    """One-hot-matmul drivable gather == fancy-index reference, including
    the Q-padding path."""
    import numpy as np
    import jax.numpy as jnp
    from cld_tpu.ops.pallas_kernels import drivable_gather_pallas, drivable_gather_ref

    rng = np.random.default_rng(3)
    B, Q, H, W = 3, 777, 96, 96
    drv = jnp.asarray(rng.random((B, H, W)), jnp.float32)
    pix = jnp.asarray(
        np.stack([rng.integers(0, W, (B, Q)), rng.integers(0, H, (B, Q))], -1),
        jnp.int32,
    )
    ref = drivable_gather_ref(pix, drv)
    out = drivable_gather_pallas(pix, drv, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
