#!/usr/bin/env python
"""Training CLI: VAE / DM / PPO stages + open-loop test.

Capability parity with `/root/reference/train.py:25-61` +
`utils/trainer_utils.py:15-153`: one YAML config drives all stages, each
stage loads the previous stage's checkpoint (the cross-stage weight handoff
the reference does with prefix-stripped state_dicts), metrics stream to
stdout + a JSONL file, checkpoints are orbax directories.

Usage:
    python train.py --config config.yaml --mode vae
    python train.py --mode dm --vae-ckpt runs/vae/ckpt_final
    python train.py --mode ppo --vae-ckpt ... --dm-ckpt ...
    python train.py --mode test --vae-ckpt ... --dm-ckpt ...
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

# honor JAX_PLATFORMS explicitly: the axon TPU plugin overrides the env var
# (CLAUDE.md), so `JAX_PLATFORMS=cpu python train.py ...` would silently
# land on (or hang waiting for) the TPU without this
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from cld_tpu.data.loader import make_loader
from cld_tpu.eval.metrics import realism_deviation
from cld_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cld_tpu.training.checkpoints import (
    restore_pytree,
    restore_train_state,
    save_pytree,
    save_train_state,
)
from cld_tpu.training.dm import DMTrainer
from cld_tpu.training.ppo import PPOTrainer, buffer_init
from cld_tpu.training.vae import VAETrainer
from cld_tpu.utils.config import default_config, load_config


class MetricLogger:
    def __init__(self, out_dir: str, log_every: int = 5):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self.log_every = log_every
        self._f = open(self.path, "a")

    def log(self, step: int, metrics: dict, prefix: str = "train"):
        record = {"step": step, **{f"{prefix}/{k}": float(v) for k, v in metrics.items()}}
        self._f.write(json.dumps(record) + "\n")
        if step % self.log_every == 0:
            self._f.flush()
            line = " ".join(f"{k}={v:.5g}" for k, v in record.items() if k != "step")
            print(f"[{prefix} step {step}] {line}", flush=True)


def _mesh_and_shard(cfg):
    mesh = make_mesh(cfg.train.parallel.get("dp", -1))
    return mesh


def load_vae_variables(trainer: VAETrainer, ckpt_path: str, sample_batch):
    # eval_shape: trace-only structure discovery, no device work
    abstract = jax.eval_shape(
        lambda rng, b: trainer.model.init({"params": rng, "sample": rng}, b, 0.05),
        jax.random.key(0),
        sample_batch,
    )
    like = {"params": abstract["params"], "batch_stats": abstract.get("batch_stats")}
    return restore_pytree(ckpt_path, like=like)


def train_vae(cfg, args):
    out_dir = os.path.join(args.output, "vae")
    logger = MetricLogger(out_dir, cfg.train.logging.log_every_n_steps)
    mesh = _mesh_and_shard(cfg)
    loader = make_loader(cfg, "train", mesh=mesh)
    trainer = VAETrainer(cfg)
    it = iter(loader)
    first = shard_batch(next(it), mesh)
    state = replicate(trainer.init_state(jax.random.key(cfg.seed), first), mesh)
    start_step = 0
    if args.resume:
        state, start_step = restore_train_state(args.resume, state)
        print(f"resumed full train state from {args.resume} at step {start_step}")
        for _ in range(start_step):  # realign the data stream with the step
            next(it)
    rng = jax.random.key(cfg.seed + 1)
    num_steps = args.steps or cfg.train.training.num_steps
    t0 = time.time()
    for step in range(start_step, num_steps):
        batch = shard_batch(next(it), mesh)
        state, metrics = trainer.train_step(state, batch, rng)
        logger.log(step, metrics)
        if cfg.train.save.enabled and (step + 1) % cfg.train.save.every_n_steps == 0:
            save_pytree(
                os.path.join(out_dir, f"ckpt_{step + 1}"),
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            save_train_state(os.path.join(out_dir, f"ckpt_{step + 1}_full"), state, loop_step=step + 1)
    save_pytree(
        os.path.join(out_dir, "ckpt_final"),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    save_train_state(os.path.join(out_dir, "ckpt_final_full"), state, loop_step=num_steps)
    print(f"vae done: {num_steps} steps in {time.time() - t0:.1f}s -> {out_dir}")


def _build_dm(cfg, args, sample_batch):
    vae_trainer = VAETrainer(cfg)
    if args.vae_ckpt:
        vae_vars = load_vae_variables(vae_trainer, args.vae_ckpt, sample_batch)
    else:
        print("WARNING: no --vae-ckpt; DM will train on an untrained VAE")
        state = vae_trainer.init_state(jax.random.key(0), sample_batch)
        vae_vars = {"params": state.params, "batch_stats": state.batch_stats}
    dm_trainer = DMTrainer(cfg, vae_vars)
    dm_state = dm_trainer.init_state(jax.random.key(cfg.seed + 2))
    if args.dm_ckpt:
        restored = restore_pytree(args.dm_ckpt, like={"params": dm_state.params})
        dm_state = dm_state.replace(params=restored["params"])
    return dm_trainer, dm_state


def train_dm(cfg, args):
    out_dir = os.path.join(args.output, "dm")
    logger = MetricLogger(out_dir, cfg.train.logging.log_every_n_steps)
    mesh = _mesh_and_shard(cfg)
    loader = make_loader(cfg, "train", mesh=mesh)
    it = iter(loader)
    first = shard_batch(next(it), mesh)
    dm_trainer, dm_state = _build_dm(cfg, args, first)
    dm_state = replicate(dm_state, mesh)
    start_step = 0
    if args.resume:
        dm_state, start_step = restore_train_state(args.resume, dm_state)
        print(f"resumed full train state from {args.resume} at step {start_step}")
        for _ in range(start_step):  # realign the data stream with the step
            next(it)
    rng = jax.random.key(cfg.seed + 3)
    num_steps = args.steps or cfg.train.training.num_steps
    t0 = time.time()
    for step in range(start_step, num_steps):
        batch = shard_batch(next(it), mesh)
        dm_state, metrics = dm_trainer.train_step(dm_state, batch, rng)
        logger.log(step, metrics)
        if cfg.train.save.enabled and (step + 1) % cfg.train.save.every_n_steps == 0:
            save_pytree(os.path.join(out_dir, f"ckpt_{step + 1}"), {"params": dm_state.params})
            save_train_state(os.path.join(out_dir, f"ckpt_{step + 1}_full"), dm_state, loop_step=step + 1)
    save_pytree(os.path.join(out_dir, "ckpt_final"), {"params": dm_state.params})
    save_train_state(os.path.join(out_dir, "ckpt_final_full"), dm_state, loop_step=num_steps)
    print(f"dm done: {num_steps} steps in {time.time() - t0:.1f}s -> {out_dir}")


def train_ppo(cfg, args):
    out_dir = os.path.join(args.output, "ppo")
    logger = MetricLogger(out_dir, cfg.train.logging.log_every_n_steps)
    mesh = _mesh_and_shard(cfg)
    loader = make_loader(cfg, "train", mesh=mesh)
    it = iter(loader)
    first = shard_batch(next(it), mesh)
    dm_trainer, dm_state = _build_dm(cfg, args, first)
    dm_state = replicate(dm_state, mesh)
    ppo = PPOTrainer(cfg, dm_trainer)
    buf = buffer_init(
        cfg.algo.buffer_max, cfg.algo.horizon, cfg.algo.vae.latent_size,
        cfg.algo.cond_feat_dim,
    )
    start_step = 0
    if args.resume:
        # optimizer + step resume; the on-device replay buffer is transient
        # (the reference's CPU deque is likewise not checkpointed)
        dm_state, start_step = restore_train_state(args.resume, dm_state)
        print(f"resumed full train state from {args.resume} at step {start_step}")
        for _ in range(start_step):  # realign the data stream with the step
            next(it)
    rng = jax.random.key(cfg.seed + 4)
    num_steps = args.steps or cfg.train.training.num_steps
    update_interval = cfg.algo.update_interval
    t0 = time.time()
    for step in range(start_step, num_steps):
        rng, collect_rng, update_rng = jax.random.split(rng, 3)
        batch = shard_batch(next(it), mesh)
        buf, metrics = ppo.collect_step(dm_state, buf, batch, collect_rng)
        if (step + 1) % update_interval == 0:
            dm_state, pm = ppo.ppo_update(dm_state, buf, update_rng)
            metrics["ppo_loss"] = pm["loss"]
            metrics["ppo_clip_fraction"] = pm["clip_fraction"]
            metrics["ppo_ratio_mean"] = pm["ratio_mean"]
            metrics["ppo_approx_kl"] = pm["approx_kl"]
        logger.log(step, metrics)
        if cfg.train.save.enabled and (step + 1) % cfg.train.save.every_n_steps == 0:
            save_pytree(os.path.join(out_dir, f"ckpt_{step + 1}"), {"params": dm_state.params})
            save_train_state(os.path.join(out_dir, f"ckpt_{step + 1}_full"), dm_state, loop_step=step + 1)
    save_pytree(os.path.join(out_dir, "ckpt_final"), {"params": dm_state.params})
    save_train_state(os.path.join(out_dir, "ckpt_final_full"), dm_state, loop_step=num_steps)
    print(f"ppo done: {num_steps} steps in {time.time() - t0:.1f}s -> {out_dir}")


def train_scene_dm(cfg, args):
    """Scene-centric diffusion stage (CTG++ family) on synthetic scene
    batches (nuScenes scene shards via the converter when available)."""
    from cld_tpu.data.scene_batch import synthetic_scene_batch
    from cld_tpu.training.scene_dm import SceneDMTrainer

    out_dir = os.path.join(args.output, "scene_dm")
    logger = MetricLogger(out_dir, cfg.train.logging.log_every_n_steps)
    trainer = SceneDMTrainer(cfg)
    batches = [
        synthetic_scene_batch(
            seed=i,
            batch_size=max(1, cfg.train.training.batch_size // 8),
            num_agents=8,
            hist_frames=cfg.algo.history_num_frames,
            horizon=cfg.algo.future_num_frames,
        )
        for i in range(4)
    ]
    state = trainer.init_state(jax.random.key(cfg.seed), batches[0])
    rng = jax.random.key(cfg.seed + 6)
    num_steps = args.steps or cfg.train.training.num_steps
    t0 = time.time()
    for step in range(num_steps):
        state, metrics = trainer.train_step(state, batches[step % len(batches)], rng)
        logger.log(step, metrics)
        if cfg.train.save.enabled and (step + 1) % cfg.train.save.every_n_steps == 0:
            save_pytree(os.path.join(out_dir, f"ckpt_{step + 1}"), {"params": state.params})
    save_pytree(os.path.join(out_dir, "ckpt_final"), {"params": state.params})
    print(f"scene_dm done: {num_steps} steps in {time.time() - t0:.1f}s -> {out_dir}")


def train_zoo(cfg, args, algo_name=None):
    """Generic baseline-algo training via the algo factory
    (`factory.py:31-90`, `algos.py` BC/VAE/DiscreteVAE/Transformer algos)."""
    from cld_tpu.training.zoo import ZooTrainer

    name = algo_name or args.zoo_algo or cfg.algo.get("name", "bc")
    out_dir = os.path.join(args.output, f"zoo_{name}")
    logger = MetricLogger(out_dir, cfg.train.logging.log_every_n_steps)
    mesh = _mesh_and_shard(cfg)
    loader = make_loader(cfg, "train", mesh=mesh)
    it = iter(loader)
    first = shard_batch(next(it), mesh)
    trainer = ZooTrainer(cfg, name)
    state = replicate(trainer.init_state(jax.random.key(cfg.seed + 9), first), mesh)
    start_step = 0
    if args.resume:
        state, start_step = restore_train_state(args.resume, state)
        print(f"resumed full train state from {args.resume} at step {start_step}")
        for _ in range(start_step):
            next(it)
    rng = jax.random.key(cfg.seed + 10)
    num_steps = args.steps or cfg.train.training.num_steps
    t0 = time.time()
    for step in range(start_step, num_steps):
        batch = shard_batch(next(it), mesh)
        state, metrics = trainer.train_step(state, batch, rng)
        logger.log(step, metrics)
        if cfg.train.save.enabled and (step + 1) % cfg.train.save.every_n_steps == 0:
            save_pytree(
                os.path.join(out_dir, f"ckpt_{step + 1}"),
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            save_train_state(os.path.join(out_dir, f"ckpt_{step + 1}_full"), state, loop_step=step + 1)
    save_pytree(
        os.path.join(out_dir, "ckpt_final"),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    save_train_state(os.path.join(out_dir, "ckpt_final_full"), state, loop_step=num_steps)
    print(f"zoo[{name}] done: {num_steps} steps in {time.time() - t0:.1f}s -> {out_dir}")


def train_gan(cfg, args):
    """GAN traffic-model stage (`factory.py:70-71` GANTrafficModel) —
    alternating LSGAN updates (cld_tpu.training.gan)."""
    from cld_tpu.training.gan import GANTrainer

    out_dir = os.path.join(args.output, "gan")
    logger = MetricLogger(out_dir, cfg.train.logging.log_every_n_steps)
    mesh = _mesh_and_shard(cfg)
    loader = make_loader(cfg, "train", mesh=mesh)
    it = iter(loader)
    first = shard_batch(next(it), mesh)
    trainer = GANTrainer(cfg)
    state = replicate(trainer.init_state(jax.random.key(cfg.seed + 11), first), mesh)
    rng = jax.random.key(cfg.seed + 12)
    num_steps = args.steps or cfg.train.training.num_steps
    t0 = time.time()
    for step in range(num_steps):
        batch = shard_batch(next(it), mesh)
        state, metrics = trainer.train_step(state, batch, rng)
        logger.log(step, metrics)
        if cfg.train.save.enabled and (step + 1) % cfg.train.save.every_n_steps == 0:
            save_pytree(
                os.path.join(out_dir, f"ckpt_{step + 1}"),
                {"params": state.params, "batch_stats": state.batch_stats},
            )
    save_pytree(
        os.path.join(out_dir, "ckpt_final"),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    print(f"gan done: {num_steps} steps in {time.time() - t0:.1f}s -> {out_dir}")


def train_ebm(cfg, args):
    """Learned-metric (PermuteEBM InfoNCE) stage — produces the checkpoint
    consumed by rollout.py --ebm-ckpt for the learned closed-loop realism
    metric (env_metrics.py:649-959)."""
    from cld_tpu.training.ebm import EBMTrainer

    out_dir = os.path.join(args.output, "ebm")
    logger = MetricLogger(out_dir, cfg.train.logging.log_every_n_steps)
    mesh = _mesh_and_shard(cfg)
    loader = make_loader(cfg, "train", mesh=mesh)
    it = iter(loader)
    first = shard_batch(next(it), mesh)
    trainer = EBMTrainer(cfg)
    state = replicate(trainer.init_state(jax.random.key(cfg.seed + 7), first), mesh)
    start_step = 0
    if args.resume:
        state, start_step = restore_train_state(args.resume, state)
        print(f"resumed full train state from {args.resume} at step {start_step}")
        for _ in range(start_step):
            next(it)
    rng = jax.random.key(cfg.seed + 8)
    num_steps = args.steps or cfg.train.training.num_steps
    t0 = time.time()
    for step in range(start_step, num_steps):
        batch = shard_batch(next(it), mesh)
        state, metrics = trainer.train_step(state, batch, rng)
        logger.log(step, metrics)
        if cfg.train.save.enabled and (step + 1) % cfg.train.save.every_n_steps == 0:
            save_pytree(
                os.path.join(out_dir, f"ckpt_{step + 1}"),
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            save_train_state(os.path.join(out_dir, f"ckpt_{step + 1}_full"), state, loop_step=step + 1)
    save_pytree(
        os.path.join(out_dir, "ckpt_final"),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    save_train_state(os.path.join(out_dir, "ckpt_final_full"), state, loop_step=num_steps)
    print(f"ebm done: {num_steps} steps in {time.time() - t0:.1f}s -> {out_dir}")


def evaluate(cfg, args):
    """Open-loop test: failure rates + Wasserstein realism
    (`guide_dm_trainer.py:204-295`)."""
    mesh = _mesh_and_shard(cfg)
    loader = make_loader(cfg, "val", mesh=mesh)
    it = iter(loader)
    first = shard_batch(next(it), mesh)
    dm_trainer, dm_state = _build_dm(cfg, args, first)
    ppo = PPOTrainer(cfg, dm_trainer)
    rng = jax.random.key(cfg.seed + 5)
    all_rates, all_stats = [], []
    num_batches = args.steps or cfg.train.validation.num_steps_per_epoch
    batch = first
    for i in range(num_batches):
        rng, step_rng = jax.random.split(rng)
        rates, stats = ppo.test_step(dm_state, batch, step_rng)
        all_rates.append({k: float(v) for k, v in rates.items()})
        # keep [B, T] shape: jerk is differenced along T per agent, so
        # flattening here would create spurious cross-agent jerk samples
        all_stats.append({k: np.asarray(v) for k, v in stats.items()})
        batch = shard_batch(next(it), mesh)
    agg_rates = {
        k: float(np.mean([r[k] for r in all_rates])) for k in all_rates[0]
    }
    merged = {
        k: np.concatenate([s[k] for s in all_stats], axis=0) for k in all_stats[0]
    }
    realism = realism_deviation(merged, dt=cfg.algo.step_time)
    result = {**agg_rates, **realism}
    print(json.dumps(result, indent=2))
    return result


def main():
    parser = argparse.ArgumentParser(description="cld_tpu trainer")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--registered-name", type=str, default=None,
                        help="named experiment config (cld_tpu.utils.registry)")
    parser.add_argument("--mode", type=str, default=None,
                        choices=["vae", "dm", "ppo", "test", "scene_dm", "ebm", "zoo", "gan"])
    parser.add_argument("--zoo-algo", type=str, default=None,
                        help="factory algo for --mode zoo "
                             "(bc|vae|discrete_vae|TransformerPred; "
                             "factory.py:31-90)")
    parser.add_argument("--output", type=str, default="runs")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--vae-ckpt", type=str, default=None)
    parser.add_argument("--dm-ckpt", type=str, default=None)
    parser.add_argument("--resume", type=str, default=None,
                        help="full-state checkpoint (ckpt_*_full) to resume "
                             "mid-training: params + optimizer moments + "
                             "step counter (Lightning ckpt_path resume, "
                             "trainer_utils.py:95-105)")
    parser.add_argument("--precision", type=str, default=None,
                        help="network compute dtype: auto (bf16 on TPU, f32 "
                             "elsewhere — the reference's '16-mixed'), bf16, "
                             "or fp32; params/losses always stay f32")
    args = parser.parse_args()

    if args.registered_name:
        from cld_tpu.utils.registry import get_registered_experiment_config

        cfg = get_registered_experiment_config(args.registered_name)
        if args.config:
            cfg = load_config(args.config, base=cfg.unlock())
    else:
        cfg = load_config(args.config) if args.config else default_config().lock()
    if args.precision is not None:
        cfg.unlock()
        cfg.train.training.precision = args.precision
        cfg.lock()
    mode = args.mode or cfg.train.mode
    print(f"mode={mode} devices={jax.device_count()} backend={jax.default_backend()}")
    if mode == "vae":
        train_vae(cfg, args)
    elif mode == "dm":
        train_dm(cfg, args)
    elif mode == "ppo":
        train_ppo(cfg, args)
    elif mode == "scene_dm":
        train_scene_dm(cfg, args)
    elif mode == "ebm":
        train_ebm(cfg, args)
    elif mode == "zoo":
        train_zoo(cfg, args)
    elif mode == "gan":
        train_gan(cfg, args)
    elif mode == "test":
        evaluate(cfg, args)


if __name__ == "__main__":
    main()
