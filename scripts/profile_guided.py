#!/usr/bin/env python
"""Op-level device profile of the flagship guided sampling step.

Captures a jax.profiler trace of the bench guided pipeline (agent_collision
+ map_collision at every denoise step), then parses the perfetto
trace.json.gz the profiler writes and prints the top device ops by total
self time. This answers "which fusions inside the 100-step guided scan
actually burn the 1.1 ms/step" without tensorboard.

Usage: python scripts/profile_guided.py [mode]   (mode: both|map|decode|none)
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128
AGENTS_PER_SCENE = 4
N_STEPS = 100


def build(mode):
    from bench import build_flagship
    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.algos.reward import compute_reward
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import (
        AgentCollisionLoss,
        GuidanceContext,
        MapCollisionLoss,
        prepack_drivable,
    )
    from cld_tpu.guidance.perturbation import GuidanceSpec, make_perturbation_guidance
    from cld_tpu.models.vae import convert_action_to_state_and_action, decode_actions
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.ops.geometry import world_from_agent_matrix
    from cld_tpu.ops.normalization import TrajNormalizer
    from cld_tpu.utils.config import default_config

    compute_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    cfg = default_config()
    cfg.train.training.batch_size = BATCH
    batch = synthetic_batch(seed=0, batch_size=BATCH, raster_size=224)
    if compute_dtype == jnp.bfloat16:
        batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
    batch = jax.tree.map(jax.device_put, batch)
    jax.block_until_ready(batch.image)
    dm_trainer, dm_state = build_flagship(cfg, compute_dtype, batch)

    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    normalizer = TrajNormalizer()
    lane = (np.arange(BATCH) % AGENTS_PER_SCENE).astype(np.float32)
    pos_w = jnp.asarray(
        np.stack([lane * 8.0, (lane % 2) * 3.5 - 1.75], axis=-1), jnp.float32
    )
    yaw_w = jnp.zeros((BATCH,))
    scene_index = jnp.arange(BATCH) // AGENTS_PER_SCENE

    specs = {
        "both": [
            GuidanceSpec(
                AgentCollisionLoss(
                    num_disks=5, buffer_dist=0.2, scene_block=AGENTS_PER_SCENE
                ),
                10.0,
            ),
            GuidanceSpec(MapCollisionLoss(), 10.0),
        ],
        "map": [GuidanceSpec(MapCollisionLoss(), 10.0)],
        "agent": [
            GuidanceSpec(
                AgentCollisionLoss(
                    num_disks=5, buffer_dist=0.2, scene_block=AGENTS_PER_SCENE
                ),
                10.0,
            )
        ],
        "none": None,
    }[mode]

    def collect(params, batch, rng):
        enc_rng, samp_rng = jax.random.split(rng)
        _, aux = dm_trainer.encode(batch, enc_rng)
        curr = get_current_states(batch)

        def decode_fn(z):
            acts = decode_actions(
                dm_trainer.vae, dm_trainer.vae_variables, z, aux["cond_feat"]
            )
            traj = convert_action_to_state_and_action(
                acts, curr, dyn, normalizer, descaled_output=True
            )
            return traj[:, None]

        gfn = None
        if specs is not None:
            ctx = prepack_drivable(
                GuidanceContext(
                    drivable_map=batch.drivable_map,
                    raster_from_agent=batch.raster_from_agent,
                    extent=batch.extent,
                    curr_speed=batch.curr_speed,
                    world_from_agent=world_from_agent_matrix(pos_w, yaw_w),
                    scene_index=scene_index,
                )
            )
            gfn = make_perturbation_guidance(
                ctx, specs, decode_fn, lr=0.3, grad_steps=1, perturb_th=1.0
            )
        from cld_tpu.utils.config import default_config as _dc

        out = sample_traj(
            dm_trainer.denoise_fn(params), dm_trainer.schedule, samp_rng,
            aux["cond_feat"], cfg.algo.horizon, cfg.algo.vae.latent_size,
            num_samp=1, guidance_fn=gfn,
        )
        traj = decode_fn(out["pred_traj"])
        return compute_reward(traj, batch, normalizer.scale(traj)).mean()

    fn = jax.jit(collect)
    return fn, dm_state, batch


def parse_trace(log_dir):
    files = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace.json.gz found under", log_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device-lane pids (TPU op events carry 'dur' and land on device tracks)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname:
            continue
        # XLA op events: name is the fusion/op name
        name = e.get("name", "?")
        agg[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]
    print(f"\ndevice total {total/1e3:.2f} ms across {len(agg)} distinct ops")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {dur/1e3:9.3f} ms  x{cnt[name]:<6d} {name[:110]}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    fn, dm_state, batch = build(mode)
    r = fn(dm_state.params, batch, jax.random.key(10))
    jax.block_until_ready(r)
    log_dir = f"/tmp/guided_trace_{mode}"
    t0 = time.perf_counter()
    jax.profiler.start_trace(log_dir)
    for i in range(2):
        r = fn(dm_state.params, batch, jax.random.key(20 + i))
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    print(f"[{mode}] traced 2 calls in {time.perf_counter() - t0:.2f}s")
    parse_trace(log_dir)


if __name__ == "__main__":
    main()
