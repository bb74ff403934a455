"""Scene-centric diffusion trainer (CTG++ family).

Capability parity with `SceneDiffuserTrafficModel`
(`/root/reference/src/tbsim/algos/algos.py:2307` over
`models/scenediffuser.py:38`): joint diffusion of all agents' raw
state+action trajectories in a scene, conditioned per agent on encoded
vector histories + relative scene poses, denoised by the factorized
time/agent transformer. Raw-trajectory (not latent) diffusion, matching the
reference's scene model.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.training import train_state

from cld_tpu.algos.scene_dm import scene_dm_loss, scene_sample
from cld_tpu.data.scene_batch import SceneBatch
from cld_tpu.models.history_encoders import AgentHistoryEncoder
from cld_tpu.models.scene_transformer import SceneTransformerDenoiser
from cld_tpu.ops.diffusion import make_schedule
from cld_tpu.ops.dynamics import convert_state_to_state_and_action
from cld_tpu.ops.normalization import TrajNormalizer
from cld_tpu.training.state import (
    make_optimizer,
    resolve_compute_dtype,
    warmup_cosine_by_epoch,
)


class SceneCondEncoder(nn.Module):
    """Per-agent conditioning: encoded local history + scene-frame pose.
    The history length comes from the batch shape."""

    cond_dim: int = 64

    @nn.compact
    def __call__(self, batch: SceneBatch) -> jnp.ndarray:
        B, A, Th, _ = batch.hist_positions.shape
        hist_enc = AgentHistoryEncoder(
            num_steps=Th, out_dim=self.cond_dim, name="hist_encoder"
        )(
            batch.hist_positions.reshape(B * A, Th, 2),
            batch.hist_yaws.reshape(B * A, Th, 1),
            batch.hist_speeds.reshape(B * A, Th),
            batch.extent.reshape(B * A, 3),
            batch.hist_avail.reshape(B * A, Th),
        ).reshape(B, A, -1)
        pose = jnp.concatenate(
            [
                batch.agent_pos_scene,
                jnp.cos(batch.agent_yaw_scene)[..., None],
                jnp.sin(batch.agent_yaw_scene)[..., None],
            ],
            axis=-1,
        )
        pose_enc = nn.Dense(self.cond_dim, name="pose_proj")(pose)
        return hist_enc + pose_enc


class SceneDMModel(nn.Module):
    """Conditioning encoder + scene transformer denoiser in one module."""

    transition_dim: int = 6
    cond_dim: int = 64
    width: int = 128
    num_layers: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.cond_encoder = SceneCondEncoder(self.cond_dim)
        self.denoiser = SceneTransformerDenoiser(
            transition_dim=self.transition_dim,
            output_dim=self.transition_dim,
            width=self.width,
            num_layers=self.num_layers,
            dtype=self.dtype,
        )

    def encode_cond(self, batch: SceneBatch) -> jnp.ndarray:
        return self.cond_encoder(batch)

    def denoise(self, x, cond, t, agent_mask):
        return self.denoiser(x, cond, t, agent_mask)

    def __call__(self, batch: SceneBatch, x, t):
        cond = self.encode_cond(batch)
        return self.denoise(x, cond, t, batch.agent_mask)


def scene_gt_trajectories(batch: SceneBatch, dt: float = 0.1) -> jnp.ndarray:
    """GT [B, A, T, 6] state+action (scaled) via per-agent inverse dynamics."""
    traj_state = jnp.concatenate([batch.fut_positions, batch.fut_yaws], axis=-1)
    sa = convert_state_to_state_and_action(traj_state, batch.curr_speed, dt)
    return TrajNormalizer().scale(sa)


class SceneDMTrainer:
    def __init__(self, config):
        algo = config.algo
        tr = config.train.training
        self.algo = algo
        self.dt = algo.step_time
        self.model = SceneDMModel(
            transition_dim=6,
            cond_dim=algo.get("scene_cond_dim", 64),
            width=algo.get("scene_width", 128),
            num_layers=algo.get("scene_layers", 4),
            dtype=resolve_compute_dtype(tr.get("precision", "auto")),
        )
        self.schedule = make_schedule(algo.n_diffusion_steps)
        opt_cfg = algo.optim_params.dm
        self.optimizer = make_optimizer(
            warmup_cosine_by_epoch(
                opt_cfg.learning_rate.initial, tr.epochs,
                tr.get("steps_per_epoch", tr.num_steps),
            ),
            weight_decay=opt_cfg.regularization.L2,
        )
        self.train_step = jax.jit(self._train_step)

    def init_state(self, rng: jax.Array, sample_batch: SceneBatch):
        def _init(rng, batch):
            B, A, T = batch.fut_positions.shape[:3]
            x = jnp.zeros((B, A, T, 6))
            t = jnp.zeros((B,), jnp.int32)
            params = self.model.init(rng, batch, x, t)["params"]
            return train_state.TrainState.create(
                apply_fn=self.model.apply, params=params, tx=self.optimizer
            )

        return jax.jit(_init)(rng, sample_batch)

    def _train_step(
        self, state, batch: SceneBatch, rng: jax.Array
    ) -> Tuple[Any, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        x0 = scene_gt_trajectories(batch, self.dt)

        def loss_fn(params):
            cond = self.model.apply({"params": params}, batch, method="encode_cond")

            def dn(x, c, t, am):
                return self.model.apply({"params": params}, x, c, t, am, method="denoise")

            return scene_dm_loss(dn, self.schedule, rng, x0, cond, batch.agent_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads=grads)
        ok = jnp.isfinite(loss)
        new_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)
        return new_state, {"loss": loss, "skipped_nonfinite": (~ok).astype(jnp.float32)}

    def sample(self, state, batch: SceneBatch, rng: jax.Array, guidance_fn=None):
        """Joint scene sampling -> descaled [B, A, T, 6] trajectories."""
        cond = self.model.apply({"params": state.params}, batch, method="encode_cond")

        def dn(x, c, t, am):
            return self.model.apply({"params": state.params}, x, c, t, am, method="denoise")

        B, A, T = batch.fut_positions.shape[:3]
        out = scene_sample(
            dn, self.schedule, rng, cond, batch.agent_mask, T, 6,
            guidance_fn=guidance_fn,
        )
        return TrajNormalizer().descale(out["pred_traj"])
