"""Multi-agent trajectory predictor (prediction-and-planning backbone).

Capability parity with `MATrafficModel`
(`/root/reference/src/tbsim/algos/multiagent_algos.py:23-200`) wrapping
`AgentAwareRasterizedModel` (`models/multiagent_models.py`): ONE ego-centric
raster encodes the whole scene; the ego gets the global ResNet feature and
every neighbor gets a rotated-ROI feature cropped from a shared map feature
grid at its current position; per-agent MLP heads decode action sequences
which integrate through the unicycle into future trajectories. Losses:
availability-masked future MSE for ego + neighbors.

TPU-first: ROI crops are the affine bilinear gathers of
`cld_tpu.models.roi_encoder` (no CUDA ROIAlign), every agent decodes in one
batched MLP, and the unicycle integration is the cumsum integrator.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.models.context import ContextEncoder
from cld_tpu.models.nets import MLP
from cld_tpu.models.roi_encoder import ROIMapEncoder
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics
from cld_tpu.ops.geometry import transform_points

Dtype = Any


class MAAgentPredictor(nn.Module):
    """Ego + neighbors future prediction from one shared raster."""

    horizon: int = 52
    dt: float = 0.1
    cond_feat_dim: int = 256
    agent_feature_dim: int = 64
    map_arch: str = "resnet18"
    hidden: int = 256
    # Ego-conditioned prediction (`RasterizedECModel`, the bc_ec algo,
    # `algos.py:791-860` / `BehaviorCloningECConfig`): neighbor futures
    # additionally condition on the ego's planned trajectory, so the tree
    # planner can query "what do agents do IF the ego does X".
    ec_conditioning: bool = False
    ec_feat_dim: int = 64
    dyn: UnicycleParams = UnicycleParams()
    # raster meters/pixel — must match the data pipeline's rasterizer so
    # ROI crops cover the intended metric extent
    pixel_size: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, batch: TrafficBatch, train: bool = False,
        cond_traj: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        B = batch.image.shape[0]
        S = batch.all_other_agents_history_positions.shape[1]
        T = self.horizon

        # ego: global scene feature (the reference's global ResNet head)
        aux = ContextEncoder(
            cond_feat_dim=self.cond_feat_dim, map_arch=self.map_arch,
            dtype=self.dtype, name="context",
        )(batch, train=train)
        ego_feat = aux["cond_feat"]  # [B, C]

        # neighbors: rotated-ROI features at current positions
        neigh_pos = batch.all_other_agents_history_positions[:, :, -1]  # [B, S, 2]
        neigh_yaw = batch.all_other_agents_history_yaws[:, :, -1, 0]  # [B, S]
        centers_px = transform_points(neigh_pos, batch.raster_from_agent)
        roi_feat = ROIMapEncoder(
            agent_feature_dim=self.agent_feature_dim, pixel_size=self.pixel_size,
            dtype=self.dtype, name="roi",
        )(batch.image, centers_px, neigh_yaw, train=train)  # [B, S, F]

        # decode: ego actions (unicycle-integrated), neighbor positions
        ego_act = MLP(
            T * 2, (self.hidden, self.hidden), dtype=self.dtype, name="ego_head"
        )(ego_feat).reshape(B, T, 2)
        ego_states = unicycle_forward_dynamics(
            self.dyn, get_current_states(batch), ego_act, self.dt
        )  # [B, T, 4]

        feats = [roi_feat, jnp.broadcast_to(ego_feat[:, None], (B, S, ego_feat.shape[-1]))]
        if self.ec_conditioning:
            from cld_tpu.models.cvae_nets import RNNTrajectoryEncoder

            # condition on the ego plan: the provided cond_traj at query
            # time, the ego's GT future in training (teacher forcing —
            # `RasterizedECModel` does the same)
            plan = cond_traj if cond_traj is not None else batch.target_positions
            ec = RNNTrajectoryEncoder(self.ec_feat_dim, dtype=self.dtype,
                                      name="ec_encoder")(plan)
            feats.append(jnp.broadcast_to(ec[:, None], (B, S, ec.shape[-1])))
        neigh_in = jnp.concatenate(feats, axis=-1)
        neigh_traj = MLP(
            T * 2, (self.hidden,), dtype=self.dtype, name="neigh_head"
        )(neigh_in).reshape(B, S, T, 2)
        # predict offsets from the current position (stabilizes scale)
        neigh_traj = neigh_traj + neigh_pos[:, :, None, :]

        return {
            "ego_positions": ego_states[..., :2],
            "ego_yaws": ego_states[..., 3:4],
            "ego_actions": ego_act,
            "agent_positions": neigh_traj,
        }

    def loss(self, batch: TrafficBatch, train: bool = False) -> Dict[str, jnp.ndarray]:
        out = self(batch, train=train)
        ego_av = batch.target_availabilities[..., None]
        ego_mse = jnp.sum(
            ((out["ego_positions"] - batch.target_positions) ** 2) * ego_av
        ) / jnp.clip(jnp.sum(ego_av) * 2, 1e-6)
        yaw_mse = jnp.sum(
            ((out["ego_yaws"] - batch.target_yaws) ** 2) * ego_av
        ) / jnp.clip(jnp.sum(ego_av), 1e-6)
        n_av = batch.all_other_agents_future_availability[..., None]
        neigh_mse = jnp.sum(
            ((out["agent_positions"] - batch.all_other_agents_future_positions) ** 2) * n_av
        ) / jnp.clip(jnp.sum(n_av) * 2, 1e-6)
        loss = ego_mse + yaw_mse + neigh_mse
        return {
            "loss": loss, "ego_mse": ego_mse, "yaw_mse": yaw_mse,
            "neigh_mse": neigh_mse, **out,
        }
