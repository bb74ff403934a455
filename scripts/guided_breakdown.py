#!/usr/bin/env python
"""Breakdown of the flagship guided denoise step: which part costs what.

Measures the full bench pipeline (bench.py guided_collect) with different
guidance configurations on the real chip:
  none        unguided sampler (floor)
  decode      dummy cheap loss -> decode fwd + full bwd + Adam, no rules
  agent       AgentCollisionLoss only
  map         MapCollisionLoss only (min_dist_impl from argv, default rigid)
  both        the flagship pair

Run on an idle box only (CLAUDE.md measurement-contamination note).
Usage: python scripts/guided_breakdown.py [rigid|rigid_pallas|separable]
"""

import sys
import time
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


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "rigid"
    from bench import DECODE_IMPL, build_flagship
    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.algos.reward import compute_reward
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import (
        AgentCollisionLoss,
        GuidanceContext,
        MapCollisionLoss,
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

    class DummyLoss:
        def __call__(self, x, ctx, agt_mask=None):
            return jnp.mean(x[..., :2] ** 2, axis=(-2, -1))

    import numpy as _np
    from cld_tpu.guidance.losses import _decay_weights, _min_dist_rigid
    from cld_tpu.ops.geometry import transform_points as _tp

    class MapBisect:
        """MapCollisionLoss body with parts knocked out for attribution:
        skip_gather -> synthetic offroad mask from pixel parity;
        skip_min   -> constant min-dist (drops the masked-min fwd+bwd)."""

        def __init__(self, skip_gather=False, skip_min=False):
            self.skip_gather = skip_gather
            self.skip_min = skip_min

        def __call__(self, x, ctx, agt_mask=None):
            B, N, T, _ = x.shape
            R = C = 10
            P = R * C
            local = jnp.asarray(
                _np.stack(
                    _np.meshgrid(
                        _np.linspace(-0.5, 0.5, R), _np.linspace(-0.5, 0.5, C),
                        indexing="ij",
                    ),
                    -1,
                ).reshape(-1, 2),
                jnp.float32,
            )
            pos = x[..., :2]
            yaw = x[..., 3]
            lw = ctx.extent[:, :2]
            diag_len = jnp.sqrt(jnp.sum(lw * lw, axis=-1))
            pts = local[None] * lw[:, None, :]
            c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
            px = pts[:, None, None, :, 0]
            py = pts[:, None, None, :, 1]
            agt_pts = jnp.stack(
                [px * c + py * (-s), px * s + py * c], axis=-1
            ) + pos[..., None, :]
            pix = _tp(agt_pts.reshape(B, -1, 2), ctx.raster_from_agent)
            pix = jax.lax.stop_gradient(pix.reshape(B, N, T, P, 2))
            H, W = ctx.drivable_map.shape[-2:]
            col = jnp.clip(pix[..., 0].astype(jnp.int32), 0, W - 1)
            row = jnp.clip(pix[..., 1].astype(jnp.int32), 0, H - 1)
            if self.skip_gather:
                offroad = ((col + row) % 7) == 0
            else:
                from cld_tpu.ops.pallas_kernels import drivable_gather_pallas

                pixq = jnp.stack([col, row], axis=-1).reshape(B, N * T * P, 2)
                vals = drivable_gather_pallas(pixq, ctx.drivable_map)
                offroad = vals.reshape(B, N, T, P) <= 0
            per_step = jnp.sum(offroad, axis=-1)
            overlap = (per_step > 0) & (per_step < P)
            if self.skip_min:
                min_dist = 5.0 + 0.0 * agt_pts[..., 0]
            else:
                d2_local = jnp.sum(
                    (pts[:, :, None, :] - pts[:, None, :, :]) ** 2, axis=-1
                )
                min_dist = _min_dist_rigid(
                    agt_pts.reshape(B, N * T, P, 2), d2_local[:, None],
                    (~offroad).reshape(B, N * T, P),
                ).reshape(B, N, T, P)
            pt_loss = 1.0 - min_dist / diag_len[:, None, None, None]
            has_onroad = jnp.any(~offroad, axis=-1, keepdims=True)
            pt_loss = jnp.where(offroad & has_onroad, pt_loss, 0.0)
            step_loss = jnp.where(overlap, jnp.sum(pt_loss, axis=-1), 0.0)
            w = _decay_weights(T, 0.9)
            loss = jnp.einsum("t,bnt->bn", w, step_loss)
            moving = jnp.abs(ctx.curr_speed) > 0.5
            return jnp.where(moving[:, None], loss, 0.0)

    def specs_for(mode):
        agent = GuidanceSpec(
            AgentCollisionLoss(
                num_disks=5, buffer_dist=0.2, scene_block=AGENTS_PER_SCENE
            ),
            10.0,
        )
        if impl in ("jnp", "fused", "eqmin", "bf16"):
            # argv names a masked-min FORWARD schedule on the rigid path
            mapc = GuidanceSpec(
                MapCollisionLoss(min_dist_impl="rigid", min_fwd_impl=impl), 10.0
            )
        else:
            mapc = GuidanceSpec(MapCollisionLoss(min_dist_impl=impl), 10.0)
        return {
            "none": None,
            "decode": [GuidanceSpec(DummyLoss(), 10.0)],
            "agent": [agent],
            "map": [mapc],
            "both": [agent, mapc],
            # bisection variants (no chunk scan, full horizon in one shot)
            "map_full": [GuidanceSpec(MapBisect(), 10.0)],
            "map_nogather": [GuidanceSpec(MapBisect(skip_gather=True), 10.0)],
            "map_nomin": [GuidanceSpec(MapBisect(skip_min=True), 10.0)],
            "map_neither": [
                GuidanceSpec(MapBisect(skip_gather=True, skip_min=True), 10.0)
            ],
        }[mode]

    def make_fn(mode):
        specs = specs_for(mode)

        def collect(params, batch, rng):
            enc_rng, samp_rng = jax.random.split(rng)
            _, aux = dm_trainer.encode(batch, enc_rng)
            curr = get_current_states(batch)

            def decode_fn(z):
                # decode_actions with the BENCH routing (fused pallas LSTM on
                # TPU under "auto") — the flax method="decode" path this used
                # to call has a ~2x slower VJP and misattributed ~0.29 ms/step
                # of decode cost in the round-2/3 breakdowns
                acts = decode_actions(
                    dm_trainer.vae, dm_trainer.vae_variables, z, aux["cond_feat"],
                    impl=DECODE_IMPL,
                )
                traj = convert_action_to_state_and_action(
                    acts, curr, dyn, normalizer, descaled_output=True
                )
                return traj[:, None]

            gfn = None
            if specs is not None:
                from cld_tpu.guidance.losses import prepack_drivable

                ctx = prepack_drivable(GuidanceContext(
                    drivable_map=batch.drivable_map,
                    raster_from_agent=batch.raster_from_agent,
                    extent=batch.extent,
                    curr_speed=batch.curr_speed,
                    world_from_agent=world_from_agent_matrix(pos_w, yaw_w),
                    scene_index=scene_index,
                ))
                gfn = make_perturbation_guidance(
                    ctx, specs, decode_fn, lr=0.3, grad_steps=1, perturb_th=1.0
                )
            out = sample_traj(
                dm_trainer.denoise_fn(params), dm_trainer.schedule, samp_rng,
                aux["cond_feat"], cfg.algo.horizon, cfg.algo.vae.latent_size,
                num_samp=1, guidance_fn=gfn,
            )
            traj = decode_fn(out["pred_traj"])
            return compute_reward(traj, batch, normalizer.scale(traj)).mean()

        return jax.jit(collect)

    import os

    modes = os.environ.get("BREAKDOWN_MODES", "none,decode,agent,map,both").split(",")
    results = {}
    for mode in modes:
        fn = make_fn(mode)
        t0 = time.perf_counter()
        r = fn(dm_state.params, batch, jax.random.key(10))
        jax.block_until_ready(r)
        print(f"[{mode}] compiled+warm {time.perf_counter() - t0:.1f}s", flush=True)
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            r = fn(dm_state.params, batch, jax.random.key(20 + i))
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        results[mode] = dt
        print(
            f"[{mode}] {dt*1e3:.1f} ms/call  {BATCH*N_STEPS/dt:.0f} NFE/s  "
            f"(+{(dt - results.get('none', dt))*1e3/N_STEPS:.3f} ms/step over none)",
            flush=True,
        )

    print(f"\nimpl={impl}")
    for m, dt in results.items():
        print(f"  {m:8s} {dt*1e3:8.1f} ms  {BATCH*N_STEPS/dt:9.0f} NFE/s")


if __name__ == "__main__":
    main()
