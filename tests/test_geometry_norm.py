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


def test_obb_collision_matrix():
    """Exact SAT oriented-box overlap (ops/geometry.py:obb_collision_matrix)
    vs hand-checkable configurations — incl. the adjacent-lane case a
    center-distance disk test gets wrong."""
    import jax.numpy as jnp
    import numpy as np
    from cld_tpu.ops.geometry import obb_collision_matrix

    # 4.5 x 2.0 vehicles side by side, 3.2 m apart in y: boxes DON'T touch
    # (gap = 3.2 - 2.0 = 1.2 m) even though center distance 3.2 < 3.6 =
    # 0.8 * summed half-lengths would flag a disk "collision"
    pos = jnp.asarray([[0.0, 0.0], [0.0, 3.2]])
    yaw = jnp.zeros((2,))
    ext = jnp.asarray([[4.5, 2.0], [4.5, 2.0]])
    m = obb_collision_matrix(pos, yaw, ext)
    assert bool(m[0, 0]) and bool(m[1, 1])  # diagonal: box overlaps itself
    assert not bool(m[0, 1]) and not bool(m[1, 0])

    # nudge into real overlap (lateral gap < 0)
    m2 = obb_collision_matrix(pos.at[1, 1].set(1.9), yaw, ext)
    assert bool(m2[0, 1]) and bool(m2[1, 0])

    # longitudinal queue: bumper gap 0.5 m -> no collision; overlap -> yes
    pos3 = jnp.asarray([[0.0, 0.0], [5.0, 0.0]])
    assert not bool(obb_collision_matrix(pos3, yaw, ext)[0, 1])
    assert bool(obb_collision_matrix(pos3.at[1, 0].set(4.0), yaw, ext)[0, 1])

    # rotation matters: a crossing vehicle at 90 deg, 2.5 m ahead — its
    # 2.0 m width spans x in [1.5, 3.5] against ego's nose at 2.25 -> hit;
    # an axis-aligned test on the same centers would also hit, but at
    # 3.3 m ahead ([2.3, 4.3] vs nose 2.25) only the rotated box clears
    posx = jnp.asarray([[0.0, 0.0], [2.5, 0.0]])
    yawx = jnp.asarray([0.0, np.pi / 2])
    assert bool(obb_collision_matrix(posx, yawx, ext)[0, 1])
    assert not bool(obb_collision_matrix(posx.at[1, 0].set(3.3), yawx, ext)[0, 1])

    # 45-degree diagonal neighbor: corners reach further than width/2
    pos45 = jnp.asarray([[0.0, 0.0], [0.0, 2.2]])
    yaw45 = jnp.asarray([0.0, np.pi / 4])
    assert bool(obb_collision_matrix(pos45, yaw45, ext)[0, 1])
    # same centers, both axis-aligned: 2.2 > 2.0 summed half-widths -> clear
    assert not bool(obb_collision_matrix(pos45, yaw, ext)[0, 1])

    # leading [T] batch dim + extent_scale inflation
    posT = jnp.stack([pos, pos3])  # [2, 2, 2]
    yawT = jnp.zeros((2, 2))
    mT = obb_collision_matrix(posT, yawT, ext)
    assert mT.shape == (2, 2, 2)
    assert not bool(mT[0, 0, 1]) and not bool(mT[1, 0, 1])
    assert bool(obb_collision_matrix(pos, yaw, ext, extent_scale=2.0)[0, 1])
