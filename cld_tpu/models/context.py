"""Context encoder: current state + rasterized map -> conditioning feature.

Capability parity with `ContextEncoder`
(`/root/reference/models/context_utils.py:8-61`): a current-state MLP
(4 -> 64), a ResNet-18 map encoder (raster stack -> 256), and a combine MLP
(320 -> 256) with LayerNorm, producing the `cond_feat` consumed by both the
VAE and the denoiser.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.models.nets import MLP
from cld_tpu.models.resnet import ResNetEncoder

Dtype = Any


class ContextEncoder(nn.Module):
    curr_state_feat_dim: int = 64
    map_feature_dim: int = 256
    cond_feat_dim: int = 256
    map_arch: str = "resnet18"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: TrafficBatch, train: bool = False) -> Dict[str, jnp.ndarray]:
        curr_states = get_current_states(batch)  # [B, 4]
        curr_state_feat = MLP(
            self.curr_state_feat_dim,
            layer_dims=(self.curr_state_feat_dim, self.curr_state_feat_dim),
            normalization=True,
            dtype=self.dtype,
            name="agent_state_encoder",
        )(curr_states)

        # arch suffix selects the pooling head: "<resnet>_spatial_softmax"
        # uses keypoint pooling (base_models.py RasterizedMapEncoder option)
        arch, pool = self.map_arch, "avg"
        if arch.endswith("_spatial_softmax"):
            arch, pool = arch[: -len("_spatial_softmax")], "spatial_softmax"
        map_global_feat = ResNetEncoder(
            arch=arch,
            feature_dim=self.map_feature_dim,
            pool=pool,
            dtype=self.dtype,
            name="map_encoder",
        )(batch.image, train=train)

        cond_in = jnp.concatenate([curr_state_feat, map_global_feat], axis=-1)
        cond_in_dim = self.curr_state_feat_dim + self.map_feature_dim
        cond_feat = MLP(
            self.cond_feat_dim,
            layer_dims=(cond_in_dim, cond_in_dim, self.cond_feat_dim, self.cond_feat_dim),
            normalization=True,
            dtype=self.dtype,
            name="process_cond_mlp",
        )(cond_in)

        return {"cond_feat": cond_feat, "curr_states": curr_states}
