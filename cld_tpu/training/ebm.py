"""EBM learned-metric trainer.

Capability parity with the reference's `EBMMetric` algo
(`/root/reference/src/tbsim/algos/metric_algos.py` via the Lightning
factory): train `PermuteEBM` with the InfoNCE permutation objective so its
matched-pair score becomes the learned closed-loop realism metric
(`envs/env_metrics.py:649-959`). One jitted step; dp-shardable like the
other stage trainers.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.models.learned_metric import PermuteEBM, ebm_infonce_loss
from cld_tpu.training.state import (
    TrainStateWithStats,
    make_optimizer,
    resolve_compute_dtype,
)


class EBMTrainer:
    def __init__(self, config):
        algo = config.algo
        self.model = PermuteEBM(
            map_arch=algo.map_encoder_model_arch,
            map_feature_dim=algo.map_feature_dim,
            traj_feature_dim=algo.map_feature_dim,
            embedding_dim=algo.cond_feat_dim,
            dtype=resolve_compute_dtype(
                config.train.training.get("precision", "auto")
            ),
        )
        opt_cfg = algo.optim_params.vae  # same family as the VAE stage
        self.optimizer = make_optimizer(
            opt_cfg.learning_rate.initial, weight_decay=opt_cfg.regularization.L2
        )
        self.train_step = jax.jit(self._train_step)
        self.eval_step = jax.jit(self._eval_step)

    def init_state(self, rng: jax.Array, sample_batch: TrafficBatch) -> TrainStateWithStats:
        def _init(rng, batch):
            variables = self.model.init({"params": rng}, batch)
            return TrainStateWithStats.create(
                apply_fn=self.model.apply,
                params=variables["params"],
                batch_stats=variables.get("batch_stats"),
                tx=self.optimizer,
            )

        return jax.jit(_init)(rng, sample_batch)

    def _variables(self, state: TrainStateWithStats):
        v = {"params": state.params}
        if state.batch_stats is not None:
            v["batch_stats"] = state.batch_stats
        return v

    def _train_step(
        self, state: TrainStateWithStats, batch: TrafficBatch, rng: jax.Array
    ) -> Tuple[TrainStateWithStats, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out, mutated = self.model.apply(
                variables, batch, train=True, mutable=mutable
            )
            loss = ebm_infonce_loss(out["scores"])
            return loss, (out, mutated)

        (loss, (out, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mutated.get("batch_stats", state.batch_stats)
        )
        ok = jnp.isfinite(loss)
        new_state = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)
        B = out["scores"].shape[0]
        acc = (jnp.argmax(out["scores"], axis=-1) == jnp.arange(B)).mean()
        return new_state, {"loss": loss, "infonce_acc": acc}

    def _eval_step(self, state: TrainStateWithStats, batch: TrafficBatch):
        scores = self.model.apply(self._variables(state), batch, method="get_scores")
        return {"score_mean": scores.mean(), "score_std": scores.std()}

    def score_fn(self, state: TrainStateWithStats):
        """Bound (obs) -> [B] scorer for sim.learned_metrics."""
        variables = self._variables(state)

        def apply(obs: TrafficBatch) -> jnp.ndarray:
            return self.model.apply(variables, obs, method="get_scores")

        return apply
