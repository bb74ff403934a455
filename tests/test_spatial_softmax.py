"""SpatialSoftmax keypoint pooling tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.models.spatial_softmax import SpatialSoftmax


def test_keypoint_localizes_peak():
    H = W = 16
    x = jnp.full((1, H, W, 1), -10.0)
    x = x.at[0, 4, 12, 0].set(10.0)  # hot spot at row 4, col 12
    m = SpatialSoftmax(temperature=0.1)
    params = m.init(jax.random.key(0), x)
    kp = np.asarray(m.apply(params, x)).reshape(1, 1, 2)
    # expected keypoint ~ normalized coords of the peak
    exp_x = -1 + 2 * 12 / (W - 1)
    exp_y = -1 + 2 * 4 / (H - 1)
    np.testing.assert_allclose(kp[0, 0], [exp_x, exp_y], atol=0.05)


def test_num_kp_projection_and_learnable_temp():
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 6))
    m = SpatialSoftmax(num_kp=3, learnable_temperature=True)
    params = m.init(jax.random.key(2), x)
    out = m.apply(params, x)
    assert out.shape == (2, 6)  # 3 keypoints x 2
    assert "log_temperature" in params["params"]


def test_context_encoder_spatial_softmax_arch():
    """map_arch '<resnet>_spatial_softmax' selects keypoint pooling in the
    ContextEncoder (the RasterizedMapEncoder pooling option, wired through
    config.algo.map_encoder_model_arch)."""
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.models.context import ContextEncoder

    batch = synthetic_batch(seed=0, batch_size=2, raster_size=64)
    enc = ContextEncoder(cond_feat_dim=32, map_feature_dim=32,
                         map_arch="resnet18_spatial_softmax")
    out, variables = enc.init_with_output({"params": jax.random.key(0)}, batch)
    assert out["cond_feat"].shape == (2, 32)
    assert "spatial_softmax" in variables["params"]["map_encoder"]
