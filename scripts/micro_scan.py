#!/usr/bin/env python
"""Split the unguided open-loop pipeline: encode / 100-step scan / decode+
reward, each timed as its own jitted call at bench shapes (B=128)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from cld_tpu.algos.dm import sample_traj
from cld_tpu.algos.reward import compute_reward
from cld_tpu.data.batch import get_current_states
from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.models.vae import convert_action_to_state_and_action, decode_actions
from cld_tpu.ops.dynamics import UnicycleParams
from cld_tpu.ops.normalization import TrajNormalizer
from cld_tpu.utils.config import default_config

cfg = default_config()
cfg.train.training.batch_size = bench.BATCH
DT = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
batch = synthetic_batch(seed=0, batch_size=bench.BATCH, raster_size=224)
if DT == jnp.bfloat16:
    batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
batch = jax.tree.map(jax.device_put, batch)
jax.block_until_ready(batch.image)
dm_trainer, dm_state = bench.build_flagship(cfg, DT, batch)
dyn = UnicycleParams.from_config(cfg.algo.dynamics)
normalizer = TrajNormalizer()
print("built", flush=True)


def timeit(fn, args, iters=20, label=""):
    c = jax.jit(fn).lower(*args).compile()
    r = c(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = c(*args)
    jax.block_until_ready(r)
    el = (time.perf_counter() - t0) / iters
    print(f"{label:28s} {el*1e3:9.4f} ms/call", flush=True)
    return r, c


def enc(params, batch, rng):
    _, aux = dm_trainer.encode(batch, rng)
    return aux["cond_feat"]

cond, _ = timeit(enc, (dm_state.params, batch, jax.random.key(1)), label="encode (resnet+hist)")


def scan_only(params, cond, rng):
    out = sample_traj(
        dm_trainer.denoise_fn(params), dm_trainer.schedule, rng, cond,
        cfg.algo.horizon, cfg.algo.vae.latent_size, num_samp=1,
    )
    return out["pred_traj"]

z, _ = timeit(scan_only, (dm_state.params, cond, jax.random.key(2)), label="unguided 100-step scan")


def dec(params, z, cond, batch):
    curr = get_current_states(batch)
    acts = decode_actions(dm_trainer.vae, dm_trainer.vae_variables, z, cond,
                          impl=bench.DECODE_IMPL)
    traj = convert_action_to_state_and_action(acts, curr, dyn, normalizer,
                                              descaled_output=True)
    return compute_reward(traj[:, None], batch, normalizer.scale(traj[:, None])).mean()

timeit(dec, (dm_state.params, z, cond, batch), label="decode+unicycle+reward")

import os
if os.environ.get("MICRO_TRACE"):
    c = jax.jit(enc).lower(dm_state.params, batch, jax.random.key(1)).compile()
    r = c(dm_state.params, batch, jax.random.key(1)); jax.block_until_ready(r)
    with jax.profiler.trace("/tmp/encode_trace"):
        for _ in range(10):
            r = c(dm_state.params, batch, jax.random.key(1))
        jax.block_until_ready(r)
    print("trace written", flush=True)
