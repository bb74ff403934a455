#!/usr/bin/env python
"""Ablation micro-bench of MapCollisionLoss internals: a parametrized copy
of the loss body with stages stubbed out, to localize the cost that the
stage micros (scripts/micro_map.py) don't account for.

Variants (value_and_grad of each, INNER iterations per dispatch):
  full        the real loss body (should match micro_map loss_vg)
  no_gather   offroad from a cheap arithmetic mask (skips the pallas gather)
  no_min      min_dist = |p|^2 stub (skips the P x P masked min, keeps grad)
  pts_only    loss = decayed sum over the constructed points (pts + einsum
              only: isolates point construction + its backward)

Run on an idle box only.
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

B, N, T, P = 128, 1, 52, 100
RASTER = 224
INNER = 100
OUTER = 5


def timeit(body, x0):
    @jax.jit
    def run(x):
        def it(i, carry):
            x, acc = carry
            x2, s = body(x)
            return x2, acc + s

        _, acc = jax.lax.fori_loop(0, INNER, it, (x, jnp.zeros(())))
        return acc

    run(x0).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(OUTER):
        out = run(x0)
    out.block_until_ready()
    return (time.perf_counter() - t0) / (OUTER * INNER) * 1e3


def main():
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import (
        GuidanceContext,
        _decay_weights,
        _min_dist_rigid,
    )
    from cld_tpu.ops.geometry import transform_points, world_from_agent_matrix
    from cld_tpu.ops.pallas_kernels import drivable_gather_pallas

    batch = synthetic_batch(seed=0, batch_size=B, raster_size=RASTER)
    pos_w = jax.random.normal(jax.random.PRNGKey(9), (B, 2)) * 10.0
    yaw_w = jax.random.normal(jax.random.PRNGKey(10), (B,))
    ctx = GuidanceContext(
        drivable_map=batch.drivable_map,
        raster_from_agent=batch.raster_from_agent,
        extent=batch.extent,
        curr_speed=batch.curr_speed,
        world_from_agent=world_from_agent_matrix(pos_w, yaw_w),
        scene_index=batch.scene_index,
    )
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, N, T, 6)) * 2.0

    num_points_lw = (10, 10)
    decay_rate = 0.9
    guide_moving_speed_th = 0.5

    lwise = np.linspace(-0.5, 0.5, num_points_lw[0])
    wwise = np.linspace(-0.5, 0.5, num_points_lw[1])
    local = jnp.asarray(
        np.stack(np.meshgrid(lwise, wwise, indexing="ij"), -1).reshape(-1, 2),
        dtype=jnp.float32,
    )

    def body(x, gather=True, use_min=True, pts_only=False):
        pos = x[..., :2]
        yaw = x[..., 3]
        lw = ctx.extent[:, :2]
        diag_len = jnp.sqrt(jnp.sum(lw * lw, axis=-1))
        pts = local[None] * lw[:, None, :]
        c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
        px = pts[:, None, None, :, 0]
        py = pts[:, None, None, :, 1]
        rx = px * c + py * (-s)
        ry = px * s + py * c
        agt_pts = jnp.stack([rx, ry], axis=-1) + pos[..., None, :]
        w = _decay_weights(T, decay_rate)
        if pts_only:
            return jnp.sum(jnp.einsum("t,bntpc->bn", w, agt_pts))

        pix = transform_points(agt_pts.reshape(B, -1, 2), ctx.raster_from_agent)
        pix = jax.lax.stop_gradient(pix.reshape(B, N, T, P, 2))
        H, W = ctx.drivable_map.shape[-2:]
        col = jnp.clip(pix[..., 0].astype(jnp.int32), 0, W - 1)
        row = jnp.clip(pix[..., 1].astype(jnp.int32), 0, H - 1)
        if gather:
            pixq = jnp.stack([col, row], axis=-1).reshape(B, N * T * P, 2)
            drv8 = (ctx.drivable_map > 0).astype(jnp.int8)
            vals = drivable_gather_pallas(pixq, drv8)
            offroad = vals.reshape(B, N, T, P) <= 0
        else:
            offroad = (row + col) % 7 < 2

        per_step_coll = jnp.sum(offroad, axis=-1)
        overlap = (per_step_coll > 0) & (per_step_coll < P)

        if use_min:
            d2_local = jnp.sum(
                (pts[:, :, None, :] - pts[:, None, :, :]) ** 2, axis=-1
            )
            min_dist = _min_dist_rigid(
                agt_pts.reshape(B, N * T, P, 2), d2_local[:, None],
                (~offroad).reshape(B, N * T, P),
            ).reshape(B, N, T, P)
        else:
            min_dist = jnp.sum(agt_pts**2, axis=-1)

        pt_loss = 1.0 - min_dist / diag_len[:, None, None, None]
        has_onroad = jnp.any(~offroad, axis=-1, keepdims=True)
        pt_loss = jnp.where(offroad & has_onroad, pt_loss, 0.0)
        step_loss = jnp.where(overlap, jnp.sum(pt_loss, axis=-1), 0.0)
        loss = jnp.einsum("t,bnt->bn", w, step_loss)
        moving = jnp.abs(ctx.curr_speed) > guide_moving_speed_th
        return jnp.sum(jnp.where(moving[:, None], loss, 0.0))

    variants = {
        "full": dict(),
        "no_gather": dict(gather=False),
        "no_min": dict(use_min=False),
        "pts_only": dict(pts_only=True),
    }
    r = {}
    for name, kw in variants.items():
        vg = jax.value_and_grad(lambda x: body(x, **kw))

        def step(x, vg=vg):
            v, g = vg(x)
            return x + 1e-6 * g, v

        r[name] = timeit(step, x0)

    print(f"\nB={B} N={N} T={T} P={P} raster={RASTER} inner={INNER}")
    for k, v in r.items():
        print(f"  {k:10s} {v:8.4f} ms/iter")


if __name__ == "__main__":
    main()
