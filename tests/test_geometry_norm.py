"""Geometry transforms and trajectory normalization."""

import numpy as np
import jax.numpy as jnp

from cld_tpu.ops.geometry import (
    agent_from_world_matrix,
    raster_from_agent_matrix,
    rotation_matrix_2d,
    transform_points,
    world_from_agent_matrix,
)
from cld_tpu.ops.normalization import NUSC_NORM_ADD, NUSC_NORM_DIV, TrajNormalizer


def test_raster_from_agent_default():
    m = raster_from_agent_matrix(224, 0.5, (-0.5, 0.0))
    # agent origin maps to pixel (56, 112) with ego_center (-0.5, 0)
    # (reference formula ((1 + ego_center)/2) * size, trajdata_utils.py:385-395)
    p = transform_points(jnp.zeros((1, 1, 2)), jnp.asarray(m)[None])
    np.testing.assert_allclose(np.asarray(p)[0, 0], [56.0, 112.0])
    # 1 m ahead = 2 px right
    p = transform_points(jnp.array([[[1.0, 0.0]]]), jnp.asarray(m)[None])
    np.testing.assert_allclose(np.asarray(p)[0, 0], [58.0, 112.0])


def test_transform_points_roundtrip():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0, 10, (4, 2)).astype(np.float32))
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, 4).astype(np.float32))
    pts = jnp.asarray(rng.normal(0, 5, (4, 7, 2)).astype(np.float32))
    w_from_a = world_from_agent_matrix(pos, yaw)
    a_from_w = agent_from_world_matrix(pos, yaw)
    world = transform_points(pts, w_from_a)
    back = transform_points(world, a_from_w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_rotation_matrix():
    r = np.asarray(rotation_matrix_2d(jnp.array(np.pi / 2)))
    np.testing.assert_allclose(r, [[0, -1], [1, 0]], atol=1e-7)


def test_normalizer_roundtrip():
    rng = np.random.default_rng(1)
    traj = jnp.asarray(rng.normal(0, 5, (3, 52, 6)).astype(np.float32))
    n = TrajNormalizer()
    back = n.descale(n.scale(traj))
    np.testing.assert_allclose(np.asarray(back), np.asarray(traj), atol=1e-4)


def test_normalizer_subset_channels():
    n = TrajNormalizer()
    actions = jnp.zeros((2, 52, 2))
    descale = np.asarray(n.descale(actions, [4, 5]))
    np.testing.assert_allclose(descale[0, 0], NUSC_NORM_ADD[4:6], atol=1e-6)
    scaled = np.asarray(n.scale(jnp.zeros((2, 4)), [0, 1, 2, 3]))
    np.testing.assert_allclose(
        scaled[0], -NUSC_NORM_ADD[:4] / NUSC_NORM_DIV[:4], rtol=1e-5
    )
