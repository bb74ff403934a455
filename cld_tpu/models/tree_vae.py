"""Staged trajectory-tree CVAE for contingency prediction.

Capability parity with `TreeVAETrafficModel` + `RasterizedTreeVAEModel`
(`/root/reference/src/tbsim/algos/algos.py:1309-1470`, config
`TreeVAEConfig`, `configs/algo_config.py:187-225`): the horizon splits into
`stages` segments of `frames_per_stage`; every stage has its own posterior
q(z_s | segment_s, cond_s) and trajectory decoder p(segment_s | z_s, cond_s)
where cond_s chains the previous segment's end state — sampling different
z_s per stage yields a trajectory TREE (the contingency structure consumed
by the tree planner, `policies/contingency.py`). Ego-conditioning (`EC`)
enters as an optional conditioning trajectory, mirroring `get_EC_pred`.

TPU-first: stages are a static Python loop over jitted segment modules
(stage count is a config constant), samples are a batched leading dim, and
the dynamics integration is the cumsum unicycle.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.models.context import ContextEncoder
from cld_tpu.models.cvae_nets import (
    MLPTrajectoryDecoder,
    PosteriorEncoder,
    RNNTrajectoryEncoder,
)
from cld_tpu.models.nets import MLP
from cld_tpu.models.vae import get_state_and_action_from_batch
from cld_tpu.ops.losses import kld_0_1_loss
from cld_tpu.ops.normalization import TrajNormalizer

Dtype = Any


class TreeTrajectoryVAE(nn.Module):
    """Staged CVAE over trajectory segments (`TreeVAEConfig` defaults:
    stage=2, num_frames_per_stage=10, latent_dim=4)."""

    stages: int = 2
    frames_per_stage: int = 10
    latent_dim: int = 4
    condition_dim: int = 128
    ec_feat_dim: int = 64
    cond_feat_dim: int = 256
    map_arch: str = "resnet18"
    kl_weight: float = 10.0
    dt: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.context = ContextEncoder(
            cond_feat_dim=self.cond_feat_dim, map_arch=self.map_arch,
            dtype=self.dtype,
        )
        self.cond_proj = MLP(self.condition_dim, (128,), dtype=self.dtype)
        self.state_embed = MLP(32, (), dtype=self.dtype)
        self.ec_encoder = RNNTrajectoryEncoder(self.ec_feat_dim, dtype=self.dtype)
        self.posteriors = [
            PosteriorEncoder({"mu": (self.latent_dim,), "logvar": (self.latent_dim,)},
                             dtype=self.dtype)
            for _ in range(self.stages)
        ]
        self.decoders = [
            MLPTrajectoryDecoder(horizon=self.frames_per_stage, dt=self.dt,
                                 dtype=self.dtype)
            for _ in range(self.stages)
        ]

    def _conditions(self, batch: TrafficBatch, cond_traj: Optional[jnp.ndarray]):
        aux = self.context(batch)
        feats = [self.cond_proj(aux["cond_feat"])]
        if cond_traj is not None:
            feats.append(self.ec_encoder(cond_traj))
        return jnp.concatenate(feats, axis=-1)

    def _stage_cond(self, scene_feat: jnp.ndarray, prev_state: jnp.ndarray):
        return jnp.concatenate(
            [scene_feat, self.state_embed(prev_state)], axis=-1
        )

    def __call__(
        self, batch: TrafficBatch, train: bool = False,
        cond_traj: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Posterior forward + per-stage losses."""
        F, S = self.frames_per_stage, self.stages
        gt = get_state_and_action_from_batch(batch, F * S, self.dt)  # [B, S*F, 6]
        gt_scaled = TrajNormalizer().scale(gt)
        scene_feat = self._conditions(batch, cond_traj)
        cur = get_current_states(batch)

        recon, kld = 0.0, 0.0
        trajs = []
        for s in range(S):
            seg_gt = gt_scaled[:, s * F : (s + 1) * F]
            cond_s = self._stage_cond(scene_feat, cur)
            q = self.posteriors[s](seg_gt, cond_s)
            std = jnp.exp(0.5 * q["logvar"])
            noise = (
                jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
                if self.has_rng("sample") else jnp.zeros_like(std)
            )
            z = q["mu"] + noise * std
            dec = self.decoders[s](
                jnp.concatenate([z, cond_s], axis=-1), curr_states=cur
            )
            traj = dec["trajectories"]  # [B, F, 6] descaled states+actions
            trajs.append(traj)
            # availability-masked position+yaw recon on this segment
            av = batch.target_availabilities[:, s * F : (s + 1) * F, None]
            tgt_pos = batch.target_positions[:, s * F : (s + 1) * F]
            tgt_yaw = batch.target_yaws[:, s * F : (s + 1) * F]
            recon = recon + jnp.sum(
                ((traj[..., :2] - tgt_pos) ** 2) * av
            ) / jnp.clip(jnp.sum(av) * 2, 1e-6)
            recon = recon + 0.05 * jnp.sum(
                ((traj[..., 3:4] - tgt_yaw) ** 2) * av
            ) / jnp.clip(jnp.sum(av), 1e-6)
            kld = kld + kld_0_1_loss(q["mu"], q["logvar"])
            cur = traj[:, -1, :4]  # chain stages

        full = jnp.concatenate(trajs, axis=1)  # [B, S*F, 6]
        loss = recon + self.kl_weight * kld
        return {"loss": loss, "recon": recon, "kld": kld, "trajectories": full}

    def sample(
        self, batch: TrafficBatch, n: int = 4,
        cond_traj: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Prior tree sampling: n independent stage-latent chains ->
        [B, n, stages*frames_per_stage, 6]."""
        F, S = self.frames_per_stage, self.stages
        B = batch.image.shape[0]
        scene_feat = self._conditions(batch, cond_traj)
        scene_rep = jnp.repeat(scene_feat, n, axis=0)
        cur = jnp.repeat(get_current_states(batch), n, axis=0)

        trajs = []
        for s in range(S):
            z = jax.random.normal(
                self.make_rng("sample"), (B * n, self.latent_dim), jnp.float32
            )
            cond_s = self._stage_cond(scene_rep, cur)
            dec = self.decoders[s](
                jnp.concatenate([z, cond_s], axis=-1), curr_states=cur
            )
            trajs.append(dec["trajectories"])
            cur = dec["trajectories"][:, -1, :4]
        full = jnp.concatenate(trajs, axis=1)
        return full.reshape(B, n, S * F, 6)
