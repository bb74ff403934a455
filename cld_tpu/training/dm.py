"""DM stage trainer: latent diffusion on frozen-VAE latents.

Capability parity with `DMLightningModule`
(`/root/reference/src/trainers/dm_trainer.py:13-103`): the VAE (context
encoder + LSTM-VAE) is frozen; each step encodes the batch to a stochastic
latent sequence z0 and minimizes epsilon-prediction MSE on the temporal
UNet. Only the UNet's parameters live in the optimizer state, mirroring the
reference's dm.*-only checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax.training import train_state

from cld_tpu.algos.dm import dm_loss, sample_traj, transition_log_prob
from cld_tpu.data.batch import TrafficBatch
from cld_tpu.models.temporal_unet import TemporalMapUnet
from cld_tpu.models.vae import VaeModel
from cld_tpu.ops.diffusion import make_schedule
from cld_tpu.training.state import (
    ema_update,
    make_optimizer,
    resolve_compute_dtype,
    warmup_cosine_by_epoch,
)


class DMTrainState(train_state.TrainState):
    """TrainState + optional EMA parameter shadow (the reference's diffuser
    EMA, `diffuser_helpers.py:909`, used by the legacy diffuser algos)."""

    ema_params: Any = None


class DMTrainer:
    """Holds the frozen VAE variables and the trainable denoiser state."""

    def __init__(self, config, vae_variables: Any):
        algo = config.algo
        tr = config.train.training
        self.algo = algo
        # bf16 network compute on TPU ('16-mixed' parity); diffusion math
        # stays f32 inside the samplers (algos/dm.py), params stay f32
        dtype = resolve_compute_dtype(tr.get("precision", "auto"))
        self.vae = VaeModel(
            curr_state_feat_dim=algo.curr_state_feat_dim,
            map_feature_dim=algo.map_feature_dim,
            cond_feat_dim=algo.cond_feat_dim,
            map_arch=algo.map_encoder_model_arch,
            vae_hidden_size=algo.vae.hidden_size,
            vae_latent_size=algo.vae.latent_size,
            horizon=algo.horizon,
            dt=algo.step_time,
            dtype=dtype,
        )
        self.vae_variables = vae_variables  # frozen: from the VAE checkpoint
        arch = algo.get("diffuser_model_arch", "TemporalMapUnet")
        if arch == "TemporalMapUnet":
            self.unet = TemporalMapUnet(
                transition_dim=algo.vae.latent_size,
                output_dim=algo.vae.latent_size,
                dim=algo.base_dim,
                dim_mults=tuple(algo.dim_mults),
                dtype=dtype,
            )
        elif arch == "MLPResNetwork":
            from cld_tpu.models.dm_mlp import MLPResDenoiser

            self.unet = MLPResDenoiser(
                horizon=algo.horizon, transition_dim=algo.vae.latent_size,
                dtype=dtype,
            )
        else:
            raise ValueError(f"unknown diffuser_model_arch {arch!r}")
        self.ema_decay = algo.get("ema_decay", None)  # e.g. 0.995 to enable
        self.schedule = make_schedule(algo.n_diffusion_steps)
        opt_cfg = algo.optim_params.dm
        self.lr_schedule = warmup_cosine_by_epoch(
            base_lr=opt_cfg.learning_rate.initial,
            total_epochs=tr.epochs,
            steps_per_epoch=tr.get("steps_per_epoch", tr.num_steps),
        )
        self.optimizer = make_optimizer(
            self.lr_schedule, weight_decay=opt_cfg.regularization.L2
        )
        self.train_step = jax.jit(self._train_step)
        self.eval_step = jax.jit(self._eval_step)

    # -- state ---------------------------------------------------------
    def init_state(self, rng: jax.Array) -> DMTrainState:
        def _init(rng):
            z = jnp.zeros((1, self.algo.horizon, self.algo.vae.latent_size))
            cond = jnp.zeros((1, self.algo.cond_feat_dim))
            t = jnp.zeros((1,), dtype=jnp.int32)
            params = self.unet.init(rng, z, cond, t)["params"]
            return DMTrainState.create(
                apply_fn=self.unet.apply,
                params=params,
                ema_params=params if self.ema_decay else None,
                tx=self.optimizer,
            )

        return jax.jit(_init)(rng)

    # -- helpers -------------------------------------------------------
    def encode(self, batch: TrafficBatch, rng: jax.Array):
        """Frozen-VAE latents + conditioning (`dm_trainer.py:72-80`)."""
        z, _, _, aux = self.vae.apply(
            self.vae_variables, batch, method="encode", rngs={"sample": rng}
        )
        return z, aux

    def denoise_fn(self, params):
        return lambda x, c, t: self.unet.apply({"params": params}, x, c, t)

    # -- steps ----------------------------------------------------------
    def _train_step(
        self, state: train_state.TrainState, batch: TrafficBatch, rng: jax.Array
    ) -> Tuple[train_state.TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        enc_rng, loss_rng = jax.random.split(rng)
        z0, aux = self.encode(batch, enc_rng)
        z0 = jax.lax.stop_gradient(z0)
        cond = jax.lax.stop_gradient(aux["cond_feat"])

        def loss_fn(params):
            return dm_loss(self.denoise_fn(params), self.schedule, loss_rng, z0, cond)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads=grads)
        if self.ema_decay and state.ema_params is not None:
            new_state = new_state.replace(
                ema_params=ema_update(state.ema_params, new_state.params, self.ema_decay)
            )
        # non-finite-loss fault guard (see VAETrainer)
        ok = jnp.isfinite(loss)
        new_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)
        return new_state, {
            "loss": loss,
            "lr": self.lr_schedule(state.step),
            "skipped_nonfinite": (~ok).astype(jnp.float32),
        }

    def _eval_step(self, state, batch: TrafficBatch, rng: jax.Array):
        enc_rng, loss_rng = jax.random.split(rng)
        z0, aux = self.encode(batch, enc_rng)
        loss = dm_loss(
            self.denoise_fn(state.params), self.schedule, loss_rng, z0, aux["cond_feat"]
        )
        return {"loss": loss}

    def sample(
        self, state, batch: TrafficBatch, rng: jax.Array, num_samp: int = 1,
        guidance_fn=None,
    ):
        """Conditioned ancestral sampling for rollout/eval
        (`dm_model.py:103-142`)."""
        enc_rng, samp_rng = jax.random.split(rng)
        _, aux = self.encode(batch, enc_rng)
        out = sample_traj(
            self.denoise_fn(state.params),
            self.schedule,
            samp_rng,
            aux["cond_feat"],
            self.algo.horizon,
            self.algo.vae.latent_size,
            num_samp=num_samp,
            guidance_fn=guidance_fn,
        )
        out["aux_info"] = aux
        return out

    def log_prob(self, params, x_t, x_tm1, cond_feat, t):
        return transition_log_prob(
            self.denoise_fn(params), self.schedule, x_t, x_tm1, cond_feat, t
        )
