#!/usr/bin/env python
"""Probe the of-record PPO update's numeric mechanism at toy scale.

Companion to the PARITY.md "PPO at the of-record update shape" analysis:
quantifies, iteration by iteration, what the 10-epoch x 300-iter clipped-
surrogate phase of `guide_dm_trainer.py:127-183` actually does when the
t=0 posterior sigma is clipped to 1e-10 (the reference quirk both
implementations share):

* iter-by-iter: |logp_new - logp_old|, ratio stats, surrogate grad norm,
  param-delta norm;
* where the one burst of parameter movement comes from and when ratios
  underflow;
* the state after one full of-record phase (policy frozen or not).

Run on CPU: JAX_PLATFORMS=cpu python scripts/ppo_of_record_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

import cld_tpu.training.ppo as ppo_mod
from cld_tpu.algos.dm import transition_log_prob
from cld_tpu.algos.reward import offroad_reward
from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.training.dm import DMTrainer
from cld_tpu.training.ppo import PPOTrainer, buffer_init
from cld_tpu.training.vae import VAETrainer
from cld_tpu.utils.registry import get_registered_experiment_config


def _toy_reward(state_act, batch, state_act_scaled, collision_thresh=0.8, dt=0.1):
    return offroad_reward(state_act[..., :2], batch).reshape(-1)


def main():
    ppo_mod.compute_reward = _toy_reward
    cfg = get_registered_experiment_config("cld_smoke").unlock()
    cfg.algo.num_samp = 4
    cfg.algo.buffer_max = 64
    cfg.algo.ppo_update_times = 300
    cfg.algo.ppo_epochs = 10
    cfg.algo.ppo_mini_batch = 16
    cfg.algo.optim_params.dm.learning_rate.initial = 1e-2
    cfg.lock()
    B = 16
    batch = synthetic_batch(seed=0, batch_size=B, raster_size=64)
    H = 64
    ys = (np.arange(H) - 32) / 2.0
    narrow = (np.abs(ys) < 1.0).astype(np.float32)
    dmap = np.broadcast_to(narrow[None, :, None], (B, H, H)).copy()
    batch = batch._replace(drivable_map=jnp.asarray(dmap))
    vt = VAETrainer(cfg)
    vs = vt.init_state(jax.random.key(0), batch)
    dm = DMTrainer(cfg, {"params": vs.params, "batch_stats": vs.batch_stats})
    dm_state = dm.init_state(jax.random.key(2))
    ppo = PPOTrainer(cfg, dm)
    buf = buffer_init(
        cfg.algo.buffer_max, cfg.algo.horizon, cfg.algo.vae.latent_size,
        cfg.algo.cond_feat_dim,
    )
    buf, _ = ppo.collect_step(dm_state, buf, batch, jax.random.key(100))

    schedule = dm.schedule
    denoise = dm.denoise_fn
    clip_eps = 0.2

    def one_iter(state, it_rng):
        idx = jax.random.randint(it_rng, (16,), 0, jnp.maximum(buf.size, 1))
        x0 = buf.x0[idx]
        x1 = buf.x1[idx]
        logp_old = buf.log_p[idx]
        adv = buf.reward[idx] - buf.baseline
        cond = buf.cond_feat[idx]
        t = jnp.zeros((16,), jnp.int32)

        def loss_fn(params):
            logp_new = transition_log_prob(denoise(params), schedule, x1, x0, cond, t)
            diff = logp_new - logp_old
            ratio = jnp.exp(diff)
            surr1 = ratio * adv
            surr2 = jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps) * adv
            loss = -jnp.mean(jnp.minimum(surr1, surr2))
            return loss, (diff, ratio, adv)

        (loss, (diff, ratio, adv)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        gnorm = jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float64) ** 2) for g in jax.tree.leaves(grads))
        )
        new_state = state.apply_gradients(grads=grads)
        pdelta = jnp.sqrt(
            sum(
                jnp.sum((a - b).astype(jnp.float64) ** 2)
                for a, b in zip(
                    jax.tree.leaves(new_state.params), jax.tree.leaves(state.params)
                )
            )
        )
        return new_state, dict(
            loss=loss, diff_mean=diff.mean(), diff_min=diff.min(),
            diff_max=diff.max(), ratio_mean=ratio.mean(), ratio_max=ratio.max(),
            adv_std=adv.std(), gnorm=gnorm, pdelta=pdelta,
        )

    one_iter_j = jax.jit(one_iter)
    state = dm_state
    rngs = jax.random.split(jax.random.key(200), 40)
    print("iter-by-iter (first 40 of the of-record 3000):")
    for i in range(40):
        state, m = one_iter_j(state, rngs[i])
        if i < 12 or i % 10 == 0:
            print(
                f"  it {i:3d} loss {float(m['loss']):+.3e} "
                f"diff[{float(m['diff_min']):+.3e},{float(m['diff_max']):+.3e}] "
                f"ratio_mean {float(m['ratio_mean']):.3e} "
                f"ratio_max {float(m['ratio_max']):.3e} "
                f"adv_std {float(m['adv_std']):.3f} "
                f"gnorm {float(m['gnorm']):.3e} pdelta {float(m['pdelta']):.3e}",
                flush=True,
            )

    # param magnitude before/after to detect blow-up/saturation
    p0 = jnp.sqrt(sum(jnp.sum(p.astype(jnp.float64) ** 2)
                      for p in jax.tree.leaves(dm_state.params)))
    p1 = jnp.sqrt(sum(jnp.sum(p.astype(jnp.float64) ** 2)
                      for p in jax.tree.leaves(state.params)))
    print(f"param L2: initial {float(p0):.3f} -> after 40 iters {float(p1):.3f}")

    # denoiser output magnitude under the moved params (saturation check)
    x = buf.x1[:16]
    cond = buf.cond_feat[:16]
    t = jnp.zeros((16,), jnp.int32)
    e0 = denoise(dm_state.params)(x, cond, t)
    e1 = denoise(state.params)(x, cond, t)
    print(
        f"eps_hat |.|: initial mean {float(jnp.abs(e0).mean()):.4f} "
        f"max {float(jnp.abs(e0).max()):.4f}; after-40 mean "
        f"{float(jnp.abs(e1).mean()):.4f} max {float(jnp.abs(e1).max()):.4f}"
    )


if __name__ == "__main__":
    main()
