"""VAE stage trainer.

Capability parity with `VAELightningModule`
(`/root/reference/src/trainers/vae_trainer.py:8-83`): Adam(1e-4, L2 1e-5),
10-epoch warmup + cosine LR (epoch-granular), beta annealed 0.05 -> 0.3 over
9000 steps. The whole step — context encoding, VAE forward, loss, backward,
optimizer — is one jitted function; with a 'dp'-sharded batch XLA derives
the gradient all-reduce.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.models.vae import VaeModel
from cld_tpu.training.state import (
    BetaSchedule,
    TrainStateWithStats,
    make_optimizer,
    resolve_compute_dtype,
    warmup_cosine_by_epoch,
)


class VAETrainer:
    def __init__(self, config):
        algo = config.algo
        tr = config.train.training
        self.model = VaeModel(
            curr_state_feat_dim=algo.curr_state_feat_dim,
            map_feature_dim=algo.map_feature_dim,
            cond_feat_dim=algo.cond_feat_dim,
            map_arch=algo.map_encoder_model_arch,
            vae_hidden_size=algo.vae.hidden_size,
            vae_latent_size=algo.vae.latent_size,
            horizon=algo.horizon,
            dt=algo.step_time,
            # bf16 network compute on TPU ('16-mixed' parity); params and
            # loss math stay f32 (models/vae.py:vae_loss)
            dtype=resolve_compute_dtype(tr.get("precision", "auto")),
        )
        opt_cfg = algo.optim_params.vae
        self.lr_schedule = warmup_cosine_by_epoch(
            base_lr=opt_cfg.learning_rate.initial,
            total_epochs=tr.epochs,
            steps_per_epoch=tr.get("steps_per_epoch", tr.num_steps),
        )
        self.optimizer = make_optimizer(
            self.lr_schedule, weight_decay=opt_cfg.regularization.L2
        )
        self.beta_schedule = BetaSchedule()
        self.train_step = jax.jit(self._train_step)
        self.eval_step = jax.jit(self._eval_step)

    def init_state(self, rng: jax.Array, sample_batch: TrafficBatch) -> TrainStateWithStats:
        # The whole init (param creation + optimizer zeros) runs under jit:
        # eager init would dispatch thousands of constant ops individually,
        # which is pathological over a remote-device transport.
        def _init(rng, batch):
            params_rng, sample_rng = jax.random.split(rng)
            variables = self.model.init(
                {"params": params_rng, "sample": sample_rng}, batch, 0.05
            )
            return TrainStateWithStats.create(
                apply_fn=self.model.apply,
                params=variables["params"],
                batch_stats=variables.get("batch_stats"),
                tx=self.optimizer,
            )

        return jax.jit(_init)(rng, sample_batch)

    def _train_step(
        self, state: TrainStateWithStats, batch: TrafficBatch, rng: jax.Array
    ) -> Tuple[TrainStateWithStats, Dict[str, jnp.ndarray]]:
        beta = self.beta_schedule(state.step)
        sample_rng, dropout_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                beta,
                train=True,
                rngs={"sample": sample_rng, "dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            return out["loss"], (out, mutated)

        (loss, (out, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mutated["batch_stats"]
        )
        # fault guard: a non-finite loss (bad batch / numeric blow-up) skips
        # the update instead of poisoning the parameters (the reference has
        # no recovery story — SURVEY.md §5 failure detection)
        ok = jnp.isfinite(loss)
        new_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)
        metrics = {
            "skipped_nonfinite": (~ok).astype(jnp.float32),
            "loss": loss,
            "recon": out["recon"],
            "kld": out["kld"],
            "beta": beta,
            "lr": self.lr_schedule(state.step),
        }
        return new_state, metrics

    def _eval_step(self, state: TrainStateWithStats, batch: TrafficBatch):
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            self.beta_schedule(state.step),
            train=False,
        )
        return {"loss": out["loss"], "recon": out["recon"], "kld": out["kld"]}
