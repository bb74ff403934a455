"""ROI map-feature encoder + feature-grid query tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.models.roi_encoder import (
    MapGridEncoder,
    ROIMapEncoder,
    query_feature_grid,
    rotated_roi_crop,
)


def test_query_feature_grid_bilinear():
    # grid whose single channel equals its x coordinate
    H = W = 8
    grid = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, None, :, None], (1, H, W, 1)
    )
    pts = jnp.array([[[2.0, 3.0], [2.5, 3.0], [6.25, 1.0]]])
    out = np.asarray(query_feature_grid(pts, grid))[0, :, 0]
    np.testing.assert_allclose(out, [2.0, 2.5, 6.25], atol=1e-5)
    # out-of-range clamps instead of exploding
    out2 = query_feature_grid(jnp.array([[[100.0, -5.0]]]), grid)
    assert np.isfinite(np.asarray(out2)).all()


def test_rotated_roi_crop_orientation():
    # channel = x coordinate; a 90-degree-rotated ROI reads the x gradient
    # along its own y axis
    H = W = 32
    grid = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.float32)[None, None, :, None], (1, H, W, 1)
    )
    center = jnp.array([[[16.0, 16.0]]])
    roi0 = rotated_roi_crop(grid, center, jnp.zeros((1, 1)), (5, 5), roi_extent=8.0)
    roi90 = rotated_roi_crop(
        grid, center, jnp.full((1, 1), np.pi / 2), (5, 5), roi_extent=8.0
    )
    a0 = np.asarray(roi0)[0, 0, :, :, 0]
    a90 = np.asarray(roi90)[0, 0, :, :, 0]
    # unrotated: varies along columns (x), constant along rows
    assert np.abs(np.diff(a0, axis=1)).mean() > 0.5
    np.testing.assert_allclose(np.diff(a0, axis=0), 0.0, atol=1e-4)
    # rotated 90deg: varies along rows instead
    assert np.abs(np.diff(a90, axis=0)).mean() > 0.5
    np.testing.assert_allclose(np.diff(a90, axis=1), 0.0, atol=1e-4)


def test_roi_map_encoder_shapes():
    m = ROIMapEncoder(feature_dim=16, agent_feature_dim=24)
    B, A = 2, 3
    image = jax.random.normal(jax.random.key(0), (B, 64, 64, 4))
    centers = jnp.full((B, A, 2), 32.0)
    yaws = jnp.zeros((B, A))
    params = m.init(jax.random.key(1), image, centers, yaws)
    out = m.apply(params, image, centers, yaws)
    assert out.shape == (B, A, 24)
    assert np.isfinite(np.asarray(out)).all()
    # different ROI centers give different features
    out2 = m.apply(params, image, centers + 20.0, yaws)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-5


def test_map_grid_encoder_downsampling():
    m = MapGridEncoder(feature_dim=8)
    image = jnp.zeros((1, 64, 64, 34))
    params = m.init(jax.random.key(0), image)
    grid = m.apply(params, image)
    assert grid.shape == (1, 16, 16, 8)
