#!/usr/bin/env python
"""Benchmark: guided latent-diffusion throughput on real hardware.

Headline metric (BASELINE.json): guided-diffusion NFE/sec on nuScenes-sized
batches, measured on the REPRESENTATIVE guided pipeline — test-time guidance
is the reference's flagship scene-editing config: agent_collision +
map_collision (`/root/reference/src/tbsim/configs/scene_edit_config.py:130-170`),
applied as one Adam perturbation step per denoise step through the frozen
VAE decoder + unicycle (the reference's per-step perturbation,
`guidance_loss.py:2221-2282`). One NFE = one denoiser evaluation for one
trajectory. The measured pipeline per iteration is the full action-sampling
path of the reference's PPO collection step (`guide_dm_trainer.py:84-118`):
context encoding (ResNet-18 over the 224x224x34 raster stack) + 100-step
reverse diffusion (lax.scan) + VAE decode + unicycle integration + reward.

A second phase measures CLOSED-LOOP throughput (agent-steps/s): the on-device
receding-horizon simulator (`cld_tpu/sim/env.py`) with the guided DM policy —
100 sim frames, replan every 5, the scene_edit_config cadence — at two
scales: 4 scenes x 8 agents (round-1/2 config of record) and the
BASELINE-spec 50-agents-per-scene scale (2 scenes x 50), reported as
`closed_loop_agent_steps_per_sec` / `closed_loop_50agent_steps_per_sec`.

The reference publishes no absolute throughput (BASELINE.md). `vs_baseline`
compares GUIDED-to-GUIDED against a documented engineering estimate of the
reference's guided torch GPU path, ~5k NFE/s at batch 128: the unguided loop
is ~25k NFE/s (TemporalMapUnet forward ~= 5 ms on an A100-class GPU,
sequential 100-step Python loop), and the guided loop adds a per-step Adam
perturbation (decoder forward+backward + agent/map collision losses
forward+backward + optimizer step) in eager torch — the reference's own
recorded microbenchmark of just the unicycle integrator inside that
machinery is 1.2 s per 100-step/1-grad-update run
(`src/tbsim/models/diffuser_helpers.py:560-565`), bounding the full guided
pipeline to a few thousand NFE/s. The unguided pipeline is also measured
and reported against the 25k unguided estimate as an extra.

MFU extras: XLA's compiled cost analysis supplies the FLOP count of the
exact executable being timed; peak is looked up from the device kind, so
`guided_pipeline_mfu` / `denoiser_mfu` answer "how far from the MXU
speed-of-light is this?" without a hand-maintained FLOPs model.

Outage resilience: the axon TPU lives behind a remote tunnel that
intermittently drops (documented in CLAUDE.md; it cost the round-2
artifact). Before any in-process backend touch, the backend is probed in a
SUBPROCESS under a hard timeout, with bounded retries — a half-up tunnel
hangs `jax.devices()` indefinitely and a dead one raises, and the probe
catches both without poisoning this process. A watchdog thread enforces an
overall deadline; on any failure path one structured JSON line (same schema,
an `error` field, all partial phase results gathered so far) is still
printed so the driver artifact is interpretable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REFERENCE_UNGUIDED_NFE_PER_SEC_ESTIMATE = 25_000.0
REFERENCE_GUIDED_NFE_PER_SEC_ESTIMATE = 5_000.0

# batch 128 matches the reference's training batch of record; NFE/s is
# throughput-normalized so the metric is comparable across batch sizes.
BATCH = int(os.environ.get("BENCH_BATCH", 128))
AGENTS_PER_SCENE = 4  # guidance sees scenes of 4 interacting agents
NUM_SAMP = 1
N_STEPS = 100
SKIP_CLOSED_LOOP = os.environ.get("BENCH_SKIP_CLOSED_LOOP", "0") == "1"
# scan unrolling for the 100-step sampler: >1 trades compile time for
# steady-state throughput (per-step loop overhead amortized, cross-step
# fusion). Compile on the axon tunnel grows with the unrolled body.
# Default 2: a round-5 A/B/A (guided 204.7k/204.5k at unroll 2 vs 198.1k
# sandwiched at 1; unguided 456k/462k vs 450k) reproduced round 3's +1.7%
# direction on both pipelines, consistently above every unroll-1 reading
# of the day. Unroll 4 measured no further gain (r3).
UNROLL = int(os.environ.get("BENCH_UNROLL", 2))
# decoder impl for the guidance decode indirection: "auto" routes to the
# fused pallas LSTM stack on TPU (ops/lstm_pallas.py), "flax" to the
# module scan (A/B knob)
DECODE_IMPL = os.environ.get("BENCH_DECODE_IMPL", "auto")
CL_SCENES = int(os.environ.get("BENCH_CL_SCENES", 4))
CL_AGENTS = int(os.environ.get("BENCH_CL_AGENTS", 8))  # per scene
CL_STEPS = int(os.environ.get("BENCH_CL_STEPS", 100))
CL50_SCENES = int(os.environ.get("BENCH_CL50_SCENES", 2))
CL50_AGENTS = int(os.environ.get("BENCH_CL50_AGENTS", 50))
SKIP_CL50 = os.environ.get("BENCH_SKIP_CL50", "0") == "1"
SKIP_CL_5SAMP = os.environ.get("BENCH_SKIP_CL_5SAMP", "0") == "1"
SKIP_DDIM = os.environ.get("BENCH_SKIP_DDIM", "0") == "1"
# CPU smoke mode: skip the tunnel probe (CPU cannot outage) and pin the
# platform via jax.config — the axon plugin overrides JAX_PLATFORMS env.
FORCE_CPU = os.environ.get("BENCH_FORCE_CPU", "0") == "1"

# -- outage resilience ------------------------------------------------------
# Overall wall-clock budget. When it expires the watchdog prints the
# structured line with whatever phases completed and hard-exits — a half-up
# tunnel must never hang the process past the driver's patience.
DEADLINE_SECS = float(os.environ.get("BENCH_DEADLINE_SECS", 3000))
PROBE_ATTEMPTS = int(os.environ.get("BENCH_PROBE_ATTEMPTS", 3))
PROBE_TIMEOUT = float(os.environ.get("BENCH_PROBE_TIMEOUT", 120))
PROBE_SLEEP = float(os.environ.get("BENCH_PROBE_SLEEP", 60))

_T0 = time.monotonic()
# Partial results gathered as phases complete; every failure line carries
# them so a late-phase hang still yields the early-phase numbers.
PARTIAL: dict = {}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def time_left() -> float:
    return DEADLINE_SECS - (time.monotonic() - _T0)


def emit(payload: dict):
    """Print the single JSON line exactly once, even under failure races."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps(payload), flush=True)


def emit_failure(error: str):
    emit(
        {
            "metric": "guided_sampling_nfe_per_sec",
            "value": 0.0,
            "unit": "NFE/s (NOT MEASURED — see error field)",
            "vs_baseline": 0.0,
            "error": error,
            **PARTIAL,
        }
    )


def probe_backend() -> bool:
    """Probe JAX backend init in a subprocess under a hard timeout.

    The two observed tunnel failure modes are (a) a fast
    `RuntimeError: Unable to initialize backend 'axon'` and (b) an
    indefinite hang inside device init (judge-observed 590 s in round 2).
    A subprocess probe bounds both without wedging this process's jax.
    """
    for attempt in range(1, PROBE_ATTEMPTS + 1):
        budget = min(PROBE_TIMEOUT, max(10.0, time_left() - 30.0))
        t0 = time.monotonic()
        try:
            r = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax; d = jax.devices(); print(d[0].platform)",
                ],
                timeout=budget,
                capture_output=True,
                text=True,
            )
            if r.returncode == 0:
                plat = (r.stdout.strip().splitlines() or ["?"])[-1]
                log(
                    f"backend probe {attempt}/{PROBE_ATTEMPTS} OK "
                    f"(platform={plat}, {time.monotonic() - t0:.0f}s)"
                )
                return True
            tail = (r.stderr or "").strip().splitlines()[-1:]
            log(
                f"backend probe {attempt}/{PROBE_ATTEMPTS} failed rc={r.returncode}"
                f" ({time.monotonic() - t0:.0f}s): {tail}"
            )
        except subprocess.TimeoutExpired:
            log(
                f"backend probe {attempt}/{PROBE_ATTEMPTS} HUNG past "
                f"{budget:.0f}s (half-up tunnel) — killed"
            )
        if attempt < PROBE_ATTEMPTS and time_left() > PROBE_SLEEP + 60:
            log(f"retrying probe in {PROBE_SLEEP:.0f}s")
            time.sleep(PROBE_SLEEP)
    return False


def start_watchdog():
    def _watch():
        while True:
            left = time_left()
            if left <= 0:
                emit_failure(
                    f"watchdog: deadline of {DEADLINE_SECS:.0f}s expired "
                    f"(likely a mid-run tunnel hang); partial results attached"
                )
                sys.stdout.flush()
                os._exit(4)
            time.sleep(min(15.0, left))

    threading.Thread(target=_watch, daemon=True).start()


# bf16 dense peak FLOP/s per chip, keyed by device_kind substring.
_PEAK_FLOPS = (
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5", 197e12),  # v5e / "TPU v5 lite"
    ("v4", 275e12),
    ("v3", 61.5e12),  # per chip (2 cores)
)


def device_peak_flops(kind: str):
    k = kind.lower()
    for sub, peak in _PEAK_FLOPS:
        if sub in k:
            return peak
    return None


def compiled_flops(compiled):
    """FLOP count from XLA's cost analysis of the exact timed executable."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops")
        return float(f) if f and f > 0 else None
    except Exception as e:  # cost analysis is best-effort per backend
        log(f"cost_analysis unavailable: {e}")
        return None


def build_flagship(cfg, compute_dtype, batch):
    """Full-size models (config of record), bf16 compute on TPU."""
    import jax

    from cld_tpu.models.temporal_unet import TemporalMapUnet
    from cld_tpu.models.vae import VaeModel
    from cld_tpu.training.dm import DMTrainer

    vae = VaeModel(dtype=compute_dtype)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    t0 = time.perf_counter()
    vae_vars = jax.jit(lambda r, b: vae.init(r, b, 0.05))(rngs, batch)
    log(f"vae init in {time.perf_counter() - t0:.1f}s")
    dm_trainer = DMTrainer(cfg, vae_vars)
    dm_trainer.vae = VaeModel(dtype=compute_dtype)
    dm_trainer.unet = TemporalMapUnet(
        transition_dim=cfg.algo.vae.latent_size,
        output_dim=cfg.algo.vae.latent_size,
        dim=cfg.algo.base_dim,
        dim_mults=tuple(cfg.algo.dim_mults),
        dtype=compute_dtype,
    )
    dm_state = dm_trainer.init_state(jax.random.key(2))
    return dm_trainer, dm_state


def flagship_guidance_specs(scene_block=None):
    """The scene_edit_config.py:130-170 flagship editing rules.

    scene_block: agents per scene when the batch is contiguous equal-size
    scenes — lets AgentCollisionLoss run block-diagonal pairwise distances
    ([S, A, A] instead of [B, B], identical numerics)."""
    from cld_tpu.guidance.losses import AgentCollisionLoss, MapCollisionLoss
    from cld_tpu.guidance.perturbation import GuidanceSpec

    return [
        GuidanceSpec(
            AgentCollisionLoss(num_disks=5, buffer_dist=0.2, scene_block=scene_block),
            10.0,
        ),
        # defaults resolve to the fastest measured TPU config: the f32
        # separable EDT + routing backward. The round-5 alternatives —
        # "separable_xy" (routing-free moment backward at the pose
        # boundary) and "separable_xy_bf16" (bf16 EDT sweeps) — measured
        # 20-60 us/step faster in the ISOLATED map phase
        # (scripts/guided_breakdown.py map-none deltas 0.343/0.317/0.283)
        # but EQUAL in the full pipeline within +-2% ambient (clean A/B/A
        # guided:unguided ratios 0.4491 f32 vs 0.4375/0.4441 bf16): the
        # EDT sweeps overlap with other scan work under XLA fusion, so the
        # isolated saving does not translate. Keep the exact default;
        # BENCH_MAP_MIN_DIST / BENCH_MAP_MIN_FWD remain the A/B knobs.
        GuidanceSpec(
            MapCollisionLoss(
                num_points_lw=(10, 10),
                min_dist_impl=os.environ.get("BENCH_MAP_MIN_DIST", "separable"),
                min_fwd_impl=os.environ.get("BENCH_MAP_MIN_FWD", "auto"),
            ),
            10.0,
        ),
    ]


def bench_open_loop(cfg, dm_trainer, dm_state, batch, guided=True):
    """Sampling NFE/s for the representative per-replan action pipeline —
    guided (flagship scene-editing rules at every denoise step) or
    unguided (the PPO collection path). Returns (nfe_per_sec, mfu)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.algos.reward import compute_reward
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.guidance.losses import GuidanceContext, prepack_drivable
    from cld_tpu.guidance.perturbation import make_perturbation_guidance
    from cld_tpu.models.vae import (
        convert_action_to_state_and_action,
        decode_actions,
    )
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.ops.geometry import world_from_agent_matrix
    from cld_tpu.ops.normalization import TrajNormalizer

    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    normalizer = TrajNormalizer()

    # world poses: scenes of AGENTS_PER_SCENE agents in adjacent lanes with
    # longitudinal stagger, so the collision rules see real interactions
    lane = (np.arange(BATCH) % AGENTS_PER_SCENE).astype(np.float32)
    pos_w = jnp.asarray(
        np.stack([lane * 8.0, (lane % 2) * 3.5 - 1.75], axis=-1), jnp.float32
    )
    yaw_w = jnp.zeros((BATCH,))
    scene_index = jnp.arange(BATCH) // AGENTS_PER_SCENE

    # Data flows as jit ARGUMENTS, never closed over: closures would bake the
    # raster batch into the HLO as a literal (a hard failure on remote-
    # compile transports).
    def guided_collect(dm_state_params, batch, rng):
        enc_rng, samp_rng = jax.random.split(rng)
        _, aux = dm_trainer.encode(batch, enc_rng)
        curr = get_current_states(batch)

        def decode_fn(z):
            acts = decode_actions(
                dm_trainer.vae, dm_trainer.vae_variables, z, aux["cond_feat"],
                impl=DECODE_IMPL,
            )
            traj = convert_action_to_state_and_action(
                acts, curr, dyn, normalizer, descaled_output=True
            )
            return traj[:, None]

        gfn = None
        if guided:
            ctx = prepack_drivable(GuidanceContext(
                drivable_map=batch.drivable_map,
                raster_from_agent=batch.raster_from_agent,
                extent=batch.extent,
                curr_speed=batch.curr_speed,
                world_from_agent=world_from_agent_matrix(pos_w, yaw_w),
                scene_index=scene_index,
            ))
            # config-of-record opt params (`scene_edit_config.py:73-80`):
            # adam lr 0.3, 1 grad step, perturb_th None -> clip to the
            # posterior sigma at step t
            gfn = make_perturbation_guidance(
                ctx, flagship_guidance_specs(AGENTS_PER_SCENE), decode_fn,
                lr=0.3, grad_steps=1, perturb_th=None,
                sigma_schedule=jnp.exp(
                    0.5 * dm_trainer.schedule.posterior_log_variance_clipped
                ),
            )
        out = sample_traj(
            dm_trainer.denoise_fn(dm_state_params), dm_trainer.schedule, samp_rng,
            aux["cond_feat"], cfg.algo.horizon, cfg.algo.vae.latent_size,
            num_samp=NUM_SAMP, guidance_fn=gfn, unroll=UNROLL,
        )
        traj = decode_fn(out["pred_traj"])
        return compute_reward(traj, batch, normalizer.scale(traj)).mean()

    # AOT compile so the SAME executable is cost-analyzed and timed (and the
    # tunnel compile happens exactly once).
    t0 = time.perf_counter()
    compiled = (
        jax.jit(guided_collect)
        .lower(dm_state.params, batch, jax.random.key(10))
        .compile()
    )
    flops = compiled_flops(compiled)
    r = compiled(dm_state.params, batch, jax.random.key(10))
    jax.block_until_ready(r)
    log(f"open-loop pipeline compiled+warm in {time.perf_counter() - t0:.1f}s")

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        r = compiled(dm_state.params, batch, jax.random.key(20 + i))
    jax.block_until_ready(r)
    elapsed = time.perf_counter() - t0
    mfu = None
    peak = device_peak_flops(jax.devices()[0].device_kind)
    if flops and peak:
        mfu = flops * iters / elapsed / peak
    return BATCH * NUM_SAMP * N_STEPS * iters / elapsed, mfu


def bench_denoiser(cfg, dm_trainer, dm_state):
    """Bare denoiser forward (one NFE for the whole batch): per-step latency
    and MFU — isolates "is the UNet itself fast?" from pipeline overheads."""
    import jax
    import jax.numpy as jnp

    BN = BATCH * NUM_SAMP
    x = jnp.zeros((BN, cfg.algo.horizon, cfg.algo.vae.latent_size), jnp.float32)
    cond = jnp.zeros((BN, cfg.algo.cond_feat_dim), jnp.float32)
    t = jnp.zeros((BN,), jnp.int32)

    def step(params, x, cond, t):
        return dm_trainer.denoise_fn(params)(x, cond, t)

    compiled = jax.jit(step).lower(dm_state.params, x, cond, t).compile()
    flops = compiled_flops(compiled)
    r = compiled(dm_state.params, x, cond, t)
    jax.block_until_ready(r)
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        r = compiled(dm_state.params, x, cond, t)
    jax.block_until_ready(r)
    elapsed = time.perf_counter() - t0
    # per-dispatch latency: on this box every dispatch is a tunnel RPC
    # (~0.5 ms), so this key measures launch latency, not the UNet
    out = {"denoiser_dispatch_ms": round(elapsed / iters * 1e3, 4)}

    # steady-state: K chained steps inside ONE dispatch (a lax.scan, exactly
    # how the guided/unguided pipelines execute the denoiser) — this is the
    # hardware number denoiser_mfu reports
    K = 100

    def scan_steps(params, x, cond, t):
        fn = dm_trainer.denoise_fn(params)

        def body(h, _):
            # the UNet computes in bf16; keep the carry f32 like the
            # pipeline's posterior math does
            return fn(h, cond, t).astype(h.dtype), None

        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    scanned = jax.jit(scan_steps).lower(dm_state.params, x, cond, t).compile()
    r = scanned(dm_state.params, x, cond, t)
    jax.block_until_ready(r)
    outer = 5
    t0 = time.perf_counter()
    for _ in range(outer):
        r = scanned(dm_state.params, x, cond, t)
    jax.block_until_ready(r)
    per_step = (time.perf_counter() - t0) / (outer * K)
    out["denoiser_step_ms"] = round(per_step * 1e3, 4)
    peak = device_peak_flops(jax.devices()[0].device_kind)
    if flops and peak:
        out["denoiser_mfu"] = round(flops / per_step / peak, 4)
        out["denoiser_gflops_per_nfe"] = round(flops / 1e9, 2)
    return out


def bench_train_steps(cfg, dm_trainer, dm_state, batch):
    """Training throughput (steps/s at batch 128): the VAE and DM stage
    train steps, jitted end-to-end — the BASELINE.json config-5 story
    (the reference trains at '16-mixed' on one GPU; both stages here are
    one fused XLA program per step)."""
    import jax

    from cld_tpu.training.vae import VAETrainer

    results = {}
    vae_trainer = VAETrainer(cfg)
    t0 = time.perf_counter()
    vae_state = vae_trainer.init_state(jax.random.key(3), batch)
    step = vae_trainer.train_step  # already jitted
    vae_state, m = step(vae_state, batch, jax.random.key(4))
    jax.block_until_ready(m["loss"])
    log(f"vae train step compiled+warm in {time.perf_counter() - t0:.1f}s")
    # each step is one dispatch (a tunnel RPC on this box): 30 iterations
    # averages the RPC jitter that made 10-iter readings swing ~2x
    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        vae_state, m = step(vae_state, batch, jax.random.key(5 + i))
    jax.block_until_ready(m["loss"])
    results["vae_train_steps_per_sec"] = round(iters / (time.perf_counter() - t0), 2)

    t0 = time.perf_counter()
    dstep = dm_trainer.train_step  # already jitted
    dm_state2, m = dstep(dm_state, batch, jax.random.key(6))
    jax.block_until_ready(m["loss"])
    log(f"dm train step compiled+warm in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(iters):
        dm_state2, m = dstep(dm_state2, batch, jax.random.key(7 + i))
    jax.block_until_ready(m["loss"])
    results["dm_train_steps_per_sec"] = round(iters / (time.perf_counter() - t0), 2)
    return results


def bench_closed_loop(cfg, dm_trainer, dm_state, n_scenes, n_agents,
                      num_samp=1):
    """Guided closed-loop sim throughput (agent-steps/s): the second
    BASELINE.json north-star metric, on the same flagship guidance.

    num_samp > 1 adds the reference's full sampling cadence of record
    (`scene_edit_config.py:64` num_action_samples=5): every replan diffuses
    N guided samples per agent and picks one by guidance-loss filtration
    (`choose_action_from_guidance`, guidance_loss.py:22-64) — scene-level
    shared pick, since agent_collision couples agents within a scene."""
    import jax
    import jax.numpy as jnp

    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.guidance.losses import GuidanceContext, prepack_drivable
    from cld_tpu.guidance.perturbation import (
        choose_best_sample,
        make_perturbation_guidance,
        per_sample_guidance_loss,
    )
    from cld_tpu.models.vae import (
        convert_action_to_state_and_action,
        decode_actions,
    )
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.ops.normalization import TrajNormalizer
    from cld_tpu.sim.env import SimConfig, simulate
    from cld_tpu.sim.scene import synthetic_scene_pack

    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    normalizer = TrajNormalizer()
    sim_cfg = SimConfig(
        num_simulation_steps=CL_STEPS,
        n_step_action=5,
        hist_frames=cfg.algo.history_num_frames,
        raster_size=cfg.env.rasterizer.raster_size,
        pixel_size=cfg.env.rasterizer.pixel_size,
        dyn=dyn,
    )
    pack = synthetic_scene_pack(
        seed=0, num_scenes=n_scenes, agents_per_scene=n_agents,
        sim_steps=CL_STEPS,
    )
    specs = flagship_guidance_specs(n_agents)
    Na = pack.num_agents

    def policy(obs, rng):
        enc_rng, samp_rng = jax.random.split(rng)
        _, aux = dm_trainer.encode(obs, enc_rng)
        curr = get_current_states(obs)
        cond_rep = jnp.repeat(aux["cond_feat"], num_samp, axis=0)
        curr_rep = jnp.repeat(curr, num_samp, axis=0)

        def decode_fn(z):
            acts = decode_actions(
                dm_trainer.vae, dm_trainer.vae_variables, z, cond_rep,
                impl=DECODE_IMPL,
            )
            traj = convert_action_to_state_and_action(
                acts, curr_rep, dyn, normalizer, descaled_output=True
            )
            return traj.reshape(Na, num_samp, *traj.shape[1:])

        ctx = prepack_drivable(GuidanceContext(
            drivable_map=obs.drivable_map,
            raster_from_agent=obs.raster_from_agent,
            extent=obs.extent,
            curr_speed=obs.curr_speed,
            world_from_agent=obs.world_from_agent,
            scene_index=obs.scene_index,
        ))
        gfn = make_perturbation_guidance(
            ctx, specs, decode_fn, lr=0.3, grad_steps=1, perturb_th=None,
            sigma_schedule=jnp.exp(
                0.5 * dm_trainer.schedule.posterior_log_variance_clipped
            ),
        )
        out = sample_traj(
            dm_trainer.denoise_fn(dm_state.params), dm_trainer.schedule,
            samp_rng, aux["cond_feat"], cfg.algo.horizon,
            cfg.algo.vae.latent_size, num_samp=num_samp, guidance_fn=gfn,
        )
        traj = decode_fn(out["pred_traj"])  # [Na, N, T, 6]
        if num_samp > 1:
            # filtration of record: scene-level shared pick (agent_collision
            # couples agents — per-agent picks would execute un-scored
            # trajectory combinations)
            losses = per_sample_guidance_loss(traj, ctx, specs)
            best, _ = choose_best_sample(
                traj, losses, scene_index=obs.scene_index, scene_level=True
            )
        else:
            best = traj[:, 0]
        return best[:, :, 4:6]

    run = jax.jit(lambda rng: simulate(pack, policy, rng, sim_cfg))
    t0 = time.perf_counter()
    _, traj = run(jax.random.key(0))
    traj.block_until_ready()
    log(
        f"closed-loop {n_scenes}x{n_agents}x{num_samp}samp compiled+warm in "
        f"{time.perf_counter() - t0:.1f}s"
    )
    t0 = time.perf_counter()
    _, traj = run(jax.random.key(1))
    traj.block_until_ready()
    steady = time.perf_counter() - t0
    return Na * CL_STEPS / steady, steady


def bench_ddim50(cfg, dm_trainer, dm_state):
    """BASELINE.json config 2: batched open-loop sampling, 32 scenes x 20
    agents, DDIM-50 latent sampler with the map/context encoder. Reports
    NFE/s (one NFE = one denoiser evaluation for one trajectory; 50 per
    sample)."""
    import jax
    import jax.numpy as jnp

    from cld_tpu.algos.dm import sample_traj_ddim
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.models.vae import (
        convert_action_to_state_and_action,
        decode_actions,
    )
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.ops.normalization import TrajNormalizer

    n_scenes, n_agents, n_steps = 32, 20, 50
    B = n_scenes * n_agents  # 640
    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    normalizer = TrajNormalizer()
    batch = synthetic_batch(seed=1, batch_size=B, raster_size=224)
    if dm_trainer.unet.dtype == jnp.bfloat16:
        batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
    batch = jax.tree.map(jax.device_put, batch)
    jax.block_until_ready(batch.image)

    def pipeline(params, batch, rng):
        enc_rng, samp_rng = jax.random.split(rng)
        _, aux = dm_trainer.encode(batch, enc_rng)
        curr = get_current_states(batch)
        out = sample_traj_ddim(
            dm_trainer.denoise_fn(params), dm_trainer.schedule, samp_rng,
            aux["cond_feat"], cfg.algo.horizon, cfg.algo.vae.latent_size,
            num_samp=NUM_SAMP, num_steps=n_steps,
        )
        acts = decode_actions(
            dm_trainer.vae, dm_trainer.vae_variables, out["pred_traj"],
            out["cond_feat"], impl=DECODE_IMPL,
        )
        traj = convert_action_to_state_and_action(
            acts, jnp.repeat(curr, NUM_SAMP, axis=0), dyn, normalizer,
            descaled_output=True,
        )
        return traj.mean()

    compiled = (
        jax.jit(pipeline).lower(dm_state.params, batch, jax.random.key(50)).compile()
    )
    r = compiled(dm_state.params, batch, jax.random.key(50))
    jax.block_until_ready(r)
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        r = compiled(dm_state.params, batch, jax.random.key(51 + i))
    jax.block_until_ready(r)
    elapsed = time.perf_counter() - t0
    return {
        "ddim50_nfe_per_sec": round(B * NUM_SAMP * n_steps * iters / elapsed, 1),
        "ddim50_config": (
            f"{n_scenes} scenes x {n_agents} agents (batch {B}), DDIM-50, "
            f"raster 224 encode + decode, unguided (BASELINE config 2)"
        ),
    }


def bench_ppo(cfg, dm_trainer, dm_state, batch):
    """PPO-stage throughput: collection steps/s (100-NFE sample + decode +
    reward + buffer add, N=num_samp action samples) and the full
    3000-minibatch clipped-surrogate update phase (`guide_dm_trainer.py:
    84-183`: 10 epochs x 300 iters of 128 — one UNet fwd+bwd each, here a
    single lax.scan)."""
    import jax

    from cld_tpu.training.ppo import PPOTrainer, buffer_init

    ppo = PPOTrainer(cfg, dm_trainer)
    buf = buffer_init(
        cfg.algo.buffer_max, cfg.algo.horizon, cfg.algo.vae.latent_size,
        cfg.algo.cond_feat_dim,
    )
    results = {}
    t0 = time.perf_counter()
    buf, m = ppo.collect_step(dm_state, buf, batch, jax.random.key(30))
    jax.block_until_ready(m["reward"])
    log(f"ppo collect step compiled+warm in {time.perf_counter() - t0:.1f}s")
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        buf, m = ppo.collect_step(dm_state, buf, batch, jax.random.key(31 + i))
    jax.block_until_ready(m["reward"])
    results["ppo_collect_steps_per_sec"] = round(iters / (time.perf_counter() - t0), 2)

    t0 = time.perf_counter()
    dm_state2, pm = ppo.ppo_update(dm_state, buf, jax.random.key(40))
    jax.block_until_ready(pm["loss"])
    log(f"ppo update compiled+warm in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    dm_state2, pm = ppo.ppo_update(dm_state2, buf, jax.random.key(41))
    jax.block_until_ready(pm["loss"])
    wall = time.perf_counter() - t0
    n_iters = ppo.ppo_epochs * ppo.update_times
    results["ppo_update_phase_seconds"] = round(wall, 2)
    results["ppo_update_iters_per_sec"] = round(n_iters / wall, 1)
    return results


def main():
    start_watchdog()
    if not FORCE_CPU and not probe_backend():
        emit_failure(
            f"axon TPU tunnel unavailable: backend init failed/hung in "
            f"{PROBE_ATTEMPTS} subprocess probes of {PROBE_TIMEOUT:.0f}s each "
            f"(infra outage — see CLAUDE.md; code path never reached)"
        )
        sys.exit(3)

    import jax
    import jax.numpy as jnp

    if FORCE_CPU:
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: compiles on this box round-trip through a
    # remote tunnel (minutes for the guided scan), but the serialized
    # executable is cached locally keyed by HLO hash — a warm cache turns
    # repeat runs of the same shapes into seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.utils.config import default_config

    try:
        backend = jax.default_backend()
    except RuntimeError as e:  # probe passed but init raced the tunnel
        emit_failure(f"backend init failed after a successful probe: {e}")
        sys.exit(3)
    dev = jax.devices()[0]
    PARTIAL["device_kind"] = dev.device_kind
    log(f"backend={backend} device={dev.device_kind}")
    compute_dtype = jnp.bfloat16 if backend != "cpu" else jnp.float32

    cfg = default_config()
    cfg.train.training.batch_size = BATCH
    t0 = time.perf_counter()
    batch = synthetic_batch(seed=0, batch_size=BATCH, raster_size=224)
    if compute_dtype == jnp.bfloat16:
        batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
    batch = jax.tree.map(jax.device_put, batch)
    jax.block_until_ready(batch.image)
    log(f"synthetic batch B={BATCH} built+transferred in {time.perf_counter() - t0:.1f}s")

    dm_trainer, dm_state = build_flagship(cfg, compute_dtype, batch)

    nfe_per_sec = 0.0
    try:
        nfe_per_sec, guided_mfu = bench_open_loop(
            cfg, dm_trainer, dm_state, batch, guided=True
        )
        if guided_mfu is not None:
            PARTIAL["guided_pipeline_mfu"] = round(guided_mfu, 4)
        log(f"open-loop guided NFE/s = {nfe_per_sec:.0f} (mfu={guided_mfu})")
    except Exception as e:
        log(f"HEADLINE guided phase failed: {e}")
        PARTIAL["error"] = f"guided headline phase failed: {e}"[:500]

    try:
        unguided_nfe, unguided_mfu = bench_open_loop(
            cfg, dm_trainer, dm_state, batch, guided=False
        )
        log(f"open-loop unguided NFE/s = {unguided_nfe:.0f} (mfu={unguided_mfu})")
        PARTIAL["unguided_nfe_per_sec"] = round(unguided_nfe, 1)
        PARTIAL["vs_unguided_baseline"] = round(
            unguided_nfe / REFERENCE_UNGUIDED_NFE_PER_SEC_ESTIMATE, 3
        )
        if unguided_mfu is not None:
            PARTIAL["unguided_pipeline_mfu"] = round(unguided_mfu, 4)
    except Exception as e:
        log(f"unguided phase failed (non-fatal): {e}")
        PARTIAL["unguided_phase"] = f"failed: {e}"[:300]

    try:
        PARTIAL.update(bench_denoiser(cfg, dm_trainer, dm_state))
    except Exception as e:
        log(f"denoiser micro-phase failed (non-fatal): {e}")

    if not SKIP_DDIM:
        if time_left() > 420:
            try:
                PARTIAL.update(bench_ddim50(cfg, dm_trainer, dm_state))
                log(f"ddim50 NFE/s = {PARTIAL.get('ddim50_nfe_per_sec')}")
            except Exception as e:
                log(f"ddim50 phase failed (non-fatal): {e}")
                PARTIAL["ddim50_phase"] = f"failed: {e}"
        else:
            PARTIAL["ddim50_phase"] = "skipped: deadline"

    # Every phase below degrades INDIVIDUALLY on failure — one compile error
    # or tunnel hiccup must cost only its own key, never the whole artifact
    # (round 4's unguarded 5-samp phase turned a kernel compile failure into
    # rc=5 and destroyed every number of the round).
    def run_phase(name, fn, min_time=420):
        if time_left() <= min_time:
            PARTIAL[f"{name}_phase"] = "skipped: deadline"
            return
        try:
            fn()
        except Exception as e:
            log(f"{name} phase failed (non-fatal): {e}")
            PARTIAL[f"{name}_phase"] = f"failed: {type(e).__name__}: {e}"[:500]

    if os.environ.get("BENCH_SKIP_TRAIN", "0") != "1":
        run_phase(
            "train",
            lambda: PARTIAL.update(bench_train_steps(cfg, dm_trainer, dm_state, batch)),
        )
        run_phase(
            "ppo",
            lambda: PARTIAL.update(bench_ppo(cfg, dm_trainer, dm_state, batch)),
        )

    def cl_phase(key, cfg_key, n_scenes, n_agents, num_samp, cfg_note):
        rate, wall = bench_closed_loop(
            cfg, dm_trainer, dm_state, n_scenes, n_agents, num_samp=num_samp
        )
        log(f"closed-loop {key} agent-steps/s = {rate:.0f} (wall {wall:.2f}s)")
        PARTIAL[f"{key}_steps_per_sec"] = round(rate, 1)
        PARTIAL[cfg_key] = (
            f"{n_scenes} scenes x {n_agents} agents, {CL_STEPS} frames, "
            f"replan/5, {cfg_note}, raster 224"
        )

    if not SKIP_CLOSED_LOOP:
        run_phase(
            "closed_loop",
            lambda: cl_phase(
                "closed_loop_agent", "closed_loop_config", CL_SCENES,
                CL_AGENTS, 1, "guided DDPM-100",
            ),
            min_time=600,
        )
        if not SKIP_CL50:
            # BASELINE-spec scale: 50 agents per scene
            run_phase(
                "closed_loop_50agent",
                lambda: cl_phase(
                    "closed_loop_50agent", "closed_loop_50agent_config",
                    CL50_SCENES, CL50_AGENTS, 1, "guided DDPM-100",
                ),
                min_time=600,
            )
            if not SKIP_CL_5SAMP:
                # the reference's full per-replan sampling cadence of record:
                # num_action_samples=5 guided samples + guidance-loss
                # filtration (`scene_edit_config.py:64`)
                run_phase(
                    "closed_loop_50agent_5samp",
                    lambda: cl_phase(
                        "closed_loop_50agent_5samp",
                        "closed_loop_50agent_5samp_config",
                        CL50_SCENES, CL50_AGENTS, 5,
                        "5 guided DDPM-100 samples + guidance-loss filtration "
                        "per replan (scene_edit_config cadence of record)",
                    ),
                    min_time=600,
                )

    emit(
        {
            "metric": "guided_sampling_nfe_per_sec",
            "value": round(nfe_per_sec, 1),
            "unit": (
                f"NFE/s (raster encode + 100-step scan with per-step "
                f"agent_collision+map_collision decoder-gradient guidance "
                f"+ decode + reward, batch {BATCH}, scenes of "
                f"{AGENTS_PER_SCENE}; vs_baseline is guided-vs-guided, "
                f"see module docstring)"
            ),
            "vs_baseline": round(
                nfe_per_sec / REFERENCE_GUIDED_NFE_PER_SEC_ESTIMATE, 3
            ),
            **PARTIAL,
        }
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        import traceback

        traceback.print_exc()
        emit_failure(f"{type(e).__name__}: {e}")
        sys.exit(5)
