"""Rasterized behavior-cloning planner — the simplest zoo baseline.

Capability parity with `RasterizedPlanningModel`
(`/root/reference/src/tbsim/models/rasterized_models.py:29-120`, reachable
via the BC algo in `algos/algos.py:40`): map raster + current state ->
context feature -> MLP trajectory decoder, optionally integrating unicycle
dynamics (the reference's `TrajectoryDecoder` with dynamics,
`base_models.py:1125-1305`).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.models.context import ContextEncoder
from cld_tpu.models.nets import MLP
from cld_tpu.models.vae import get_state_and_action_from_batch
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics

Dtype = Any


class BCPlanner(nn.Module):
    """Context -> action sequence -> unicycle-integrated trajectory.

    `goal_conditional` adds the RasterizedGCModel capability (the bc_gc
    algo, `rasterized_models.py` goal-conditioned variant /
    `BehaviorCloningGC`, `algos.py`): the last available future position +
    yaw embeds into a goal feature concatenated to the context, so the
    decoder imitates trajectories consistent with a commanded goal. At
    query time a custom goal can be passed via `goal`."""

    horizon: int = 52
    cond_feat_dim: int = 256
    map_arch: str = "resnet18"
    goal_conditional: bool = False
    goal_feature_dim: int = 32
    dyn: UnicycleParams = UnicycleParams(
        max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0, acce_hi=8.0
    )
    dt: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.context_encoder = ContextEncoder(
            cond_feat_dim=self.cond_feat_dim, map_arch=self.map_arch, dtype=self.dtype
        )
        self.decoder = MLP(
            self.horizon * 2,
            layer_dims=(self.cond_feat_dim, self.cond_feat_dim),
            normalization=True,
            dtype=self.dtype,
        )
        if self.goal_conditional:
            self.goal_encoder = MLP(self.goal_feature_dim, (32,), dtype=self.dtype)

    def _goal_feature(self, batch: TrafficBatch, goal):
        if goal is None:
            # teacher forcing: the last available future frame is the goal
            # (`AlgoUtils.get_spatial_goal_supervision` semantics)
            from cld_tpu.models.spatial_planner import last_available_index

            idx = last_available_index(batch.target_availabilities)
            b = jnp.arange(batch.target_positions.shape[0])
            goal = jnp.concatenate(
                [batch.target_positions[b, idx], batch.target_yaws[b, idx]], axis=-1
            )  # [B, 3]
        return self.goal_encoder(goal.astype(self.dtype))

    def __call__(
        self, batch: TrafficBatch, train: bool = False, goal: jnp.ndarray = None
    ) -> Dict[str, jnp.ndarray]:
        aux = self.context_encoder(batch, train=train)
        feat = aux["cond_feat"]
        if self.goal_conditional:
            feat = jnp.concatenate([feat, self._goal_feature(batch, goal)], axis=-1)
        actions = self.decoder(feat).reshape(-1, self.horizon, 2)
        states = unicycle_forward_dynamics(
            self.dyn, get_current_states(batch), actions, self.dt
        )
        return {"trajectories": jnp.concatenate([states, actions], axis=-1), "aux_info": aux}

    def loss(self, batch: TrafficBatch, train: bool = False) -> Dict[str, jnp.ndarray]:
        """Position+yaw MSE vs GT (the BC imitation objective,
        `algos.py:40-130`)."""
        out = self(batch, train=train)
        traj = out["trajectories"]
        gt = get_state_and_action_from_batch(batch, self.horizon, self.dt)
        avail = batch.target_availabilities[..., None]
        pos_loss = jnp.mean(avail * (traj[..., :2] - gt[..., :2]) ** 2)
        yaw_loss = jnp.mean(avail * (traj[..., 3:4] - gt[..., 3:4]) ** 2)
        return {"loss": pos_loss + yaw_loss, "pos_loss": pos_loss, "yaw_loss": yaw_loss,
                "trajectories": traj}
