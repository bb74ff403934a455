"""Learned trajectory-likelihood metric (EBM).

Capability parity with `PermuteEBM`
(`/root/reference/src/tbsim/models/learned_metrics.py:10-110`) and the
learned env metrics built on it (`envs/env_metrics.py:649-959`): a map
encoder + RNN trajectory encoder score (map, trajectory) pairs; training
uses the InfoNCE objective over within-batch permutations (the [B, B] score
matrix with diagonal labels); at eval time the score is a learned realism
metric for rollout trajectories.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import optax

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.models.lstm import LSTMEncoder
from cld_tpu.models.nets import MLP
from cld_tpu.models.resnet import ResNetEncoder

Dtype = Any


class PermuteEBM(nn.Module):
    map_arch: str = "resnet18"
    map_feature_dim: int = 64
    traj_feature_dim: int = 64
    embedding_dim: int = 64
    dtype: Dtype = jnp.float32

    def setup(self):
        self.map_encoder = ResNetEncoder(
            arch=self.map_arch, feature_dim=self.map_feature_dim, dtype=self.dtype
        )
        self.traj_encoder = LSTMEncoder(
            hidden_size=self.traj_feature_dim, num_layers=1, dropout_rate=0.0,
            dtype=self.dtype,
        )
        self.embed_net = MLP(
            self.embedding_dim, layer_dims=(128, 128), normalization=True,
            output_activation=nn.relu, dtype=self.dtype,
        )
        self.score_net = nn.Dense(1, dtype=self.dtype)

    def _features(self, batch: TrafficBatch, train: bool = False):
        trajs = jnp.concatenate([batch.target_positions, batch.target_yaws], axis=-1)
        map_feat = self.map_encoder(batch.image, train=train)
        B = trajs.shape[0]
        cond = jnp.zeros((B, map_feat.shape[-1]), self.dtype)
        traj_feat = self.traj_encoder(trajs, cond)[:, -1]  # last hidden state
        return map_feat, traj_feat

    def __call__(self, batch: TrafficBatch, train: bool = False) -> Dict[str, jnp.ndarray]:
        """Contrastive score matrix [B, B]: scores[i, j] pairs map_i with
        traj_j; the true pairing is the diagonal (`learned_metrics.py:45-62`)."""
        map_feat, traj_feat = self._features(batch, train=train)
        B = map_feat.shape[0]
        map_rep = jnp.repeat(map_feat[:, None], B, axis=1)  # [B, B, Dm]
        traj_rep = jnp.repeat(traj_feat[None], B, axis=0)  # [B, B, Dt]
        emb = self.embed_net(jnp.concatenate([map_rep, traj_rep], axis=-1))
        scores = self.score_net(emb)[..., 0]  # [B, B]
        return {"scores": scores, "features": emb}

    def get_scores(self, batch: TrafficBatch, train: bool = False) -> jnp.ndarray:
        """Matched-pair scores [B] — the learned realism metric value
        (`learned_metrics.py:68-80`, consumed by env_metrics.py:649+)."""
        map_feat, traj_feat = self._features(batch, train=train)
        emb = self.embed_net(jnp.concatenate([map_feat, traj_feat], axis=-1))
        return self.score_net(emb)[..., 0]


def ebm_infonce_loss(scores: jnp.ndarray) -> jnp.ndarray:
    """InfoNCE with diagonal labels (`learned_metrics.py:82-96`
    compute_losses): each map should score its own trajectory highest.
    Log-softmax in f32 even under bf16 network compute (mixed precision)."""
    scores = scores.astype(jnp.float32)
    B = scores.shape[0]
    labels = jnp.arange(B)
    return optax.softmax_cross_entropy_with_integer_labels(scores, labels).mean()
