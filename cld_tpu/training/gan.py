"""Trajectory-GAN trainer: alternating LSGAN updates.

Capability parity with the GAN algo over the rasterized GAN model
(`/root/reference/src/tbsim/algos/algos.py` GAN branch,
`models/rasterized_models.py` GAN family): one step = a discriminator
update on (real, fake) pairs followed by a generator update, each with its
own Adam state, gradients routed by parameter subtree.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.models.gan import TrajectoryGAN
from cld_tpu.training.state import make_optimizer, resolve_compute_dtype


class GANTrainState(NamedTuple):
    params: Any  # full model params (context + generator + discriminator)
    batch_stats: Any
    g_opt_state: Any
    d_opt_state: Any
    step: jnp.ndarray


def _split_params(params):
    d_sub = {"discriminator": params["discriminator"]}
    g_sub = {k: v for k, v in params.items() if k != "discriminator"}
    return g_sub, d_sub


def _merge_params(g_sub, d_sub):
    return {**g_sub, **d_sub}


class GANTrainer:
    def __init__(self, config):
        algo = config.algo
        self.model = TrajectoryGAN(
            horizon=algo.horizon,
            cond_feat_dim=algo.cond_feat_dim,
            map_arch=algo.map_encoder_model_arch,
            generator_arch=algo.get("gan_generator_arch", "mlp"),
            dtype=resolve_compute_dtype(
                config.train.training.get("precision", "auto")
            ),
        )
        lr = algo.optim_params.vae.learning_rate.initial
        self.g_opt = make_optimizer(lr)
        self.d_opt = make_optimizer(lr)
        self.train_step = jax.jit(self._train_step)

    def init_state(self, rng: jax.Array, sample_batch: TrafficBatch) -> GANTrainState:
        def _init(rng, batch):
            p_rng, s_rng = jax.random.split(rng)
            variables = self.model.init(
                {"params": p_rng, "sample": s_rng}, batch
            )
            params = variables["params"]
            g_sub, d_sub = _split_params(params)
            return GANTrainState(
                params=params,
                batch_stats=variables.get("batch_stats"),
                g_opt_state=self.g_opt.init(g_sub),
                d_opt_state=self.d_opt.init(d_sub),
                step=jnp.zeros((), jnp.int32),
            )

        return jax.jit(_init)(rng, sample_batch)

    def _losses(self, params, batch_stats, batch, rng, train=True):
        out, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=train, rngs={"sample": rng}, mutable=["batch_stats"],
        )
        return out, mutated["batch_stats"]

    def _train_step(
        self, state: GANTrainState, batch: TrafficBatch, rng: jax.Array
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        d_rng, g_rng = jax.random.split(rng)

        # --- discriminator update (generator frozen) ---
        def d_loss_fn(d_sub):
            g_sub, _ = _split_params(state.params)
            params = _merge_params(jax.lax.stop_gradient(g_sub), d_sub)
            out, _ = self._losses(params, state.batch_stats, batch, d_rng)
            return out["d_loss"], out

        (_, d_out), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            _split_params(state.params)[1]
        )
        d_updates, d_opt_state = self.d_opt.update(d_grads, state.d_opt_state)
        d_sub_new = optax.apply_updates(_split_params(state.params)[1], d_updates)
        params = _merge_params(_split_params(state.params)[0], d_sub_new)

        # --- generator update (discriminator frozen) ---
        def g_loss_fn(g_sub):
            p = _merge_params(g_sub, jax.lax.stop_gradient(_split_params(params)[1]))
            out, bs = self._losses(p, state.batch_stats, batch, g_rng)
            return out["g_loss"], (out, bs)

        (_, (g_out, new_bs)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            _split_params(params)[0]
        )
        g_updates, g_opt_state = self.g_opt.update(g_grads, state.g_opt_state)
        g_sub_new = optax.apply_updates(_split_params(params)[0], g_updates)

        new_state = GANTrainState(
            params=_merge_params(g_sub_new, d_sub_new),
            batch_stats=new_bs,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            step=state.step + 1,
        )
        return new_state, {
            "d_loss": d_out["d_loss"],
            "g_loss": g_out["g_loss"],
            "d_real_mean": d_out["d_real_mean"],
            "d_fake_mean": d_out["d_fake_mean"],
        }
