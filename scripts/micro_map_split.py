#!/usr/bin/env python
"""Split the MapCollisionLoss per-denoise-step cost into stages.

Each stage is timed INSIDE a lax.scan over ITERS applications with a
data dependency threaded through the carry, so per-dispatch tunnel latency
(~1 ms on axon) is amortized away and XLA cannot hoist the body.

Stages (bench scale B=128, N=1, T=52, P=10x10):
  rotate   local bbox grid -> world points (the [B,N,T,P,2] materialize)
  gather   drivable bit-gather at the points (pallas one-hot matmul)
  edt_fwd  _min_dist_separable forward (E/D sweeps)
  edt_vjp  _min_dist_separable forward + backward routing
  loss_fwd full MapCollisionLoss forward
  loss_vjp full MapCollisionLoss value_and_grad wrt x

Run on an idle box only (CLAUDE.md measurement-contamination note).
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

B, N, T = 128, 1, 52
RP, CP = 10, 10
P = RP * CP
ITERS = 100


def timed(name, body, *args):
    """Run body ITERS times inside one scan dispatch; report ms/iter."""

    def run(x0, *a):
        y, _ = jax.lax.scan(lambda c, _: (body(c, *a), ()), x0, None, length=ITERS)
        return y

    compiled = jax.jit(run).lower(_X0, *args).compile()
    r = compiled(_X0, *args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = compiled(_X0, *args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / (reps * ITERS) * 1e3
    print(f"{name:10s} {ms:8.4f} ms/iter")
    return ms


def main():
    global _X0
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import (
        GuidanceContext,
        MapCollisionLoss,
        _min_dist_separable,
        bbox_local_grid,
        prepack_drivable,
        prepack_map_bbox,
    )
    from cld_tpu.ops.geometry import transform_points, world_from_agent_matrix

    batch = synthetic_batch(seed=0, batch_size=B, raster_size=224)
    lane = (np.arange(B) % 4).astype(np.float32)
    pos_w = jnp.asarray(np.stack([lane * 8.0, (lane % 2) * 3.5 - 1.75], -1), jnp.float32)
    ctx = prepack_drivable(
        GuidanceContext(
            drivable_map=batch.drivable_map,
            raster_from_agent=batch.raster_from_agent,
            extent=batch.extent,
            curr_speed=batch.curr_speed,
            world_from_agent=world_from_agent_matrix(pos_w, jnp.zeros((B,))),
            scene_index=jnp.arange(B) // 4,
        )
    )
    ctx = prepack_map_bbox(ctx, (RP, CP))
    loss = MapCollisionLoss(num_points_lw=(RP, CP))

    key = jax.random.key(0)
    x = jax.random.normal(key, (B, N, T, 6)) * jnp.asarray(
        [5.0, 2.0, 3.0, 0.3, 1.0, 0.1]
    )
    _X0 = x

    lw = ctx.extent[:, :2]
    pts_local = ctx.bbox_pts.reshape(B, RP * CP, 2)  # [B, P, 2]
    li = jnp.linspace(-0.5, 0.5, RP)
    wi = jnp.linspace(-0.5, 0.5, CP)
    rd2 = ((li[:, None] - li[None]) ** 2)[None] * (lw[:, 0] ** 2)[:, None, None]
    cd2 = ((wi[:, None] - wi[None]) ** 2)[None] * (lw[:, 1] ** 2)[:, None, None]

    def world_pts(x):
        pos = x[..., :2]
        yaw = x[..., 3]
        c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
        px = pts_local[:, None, None, :, 0]
        py = pts_local[:, None, None, :, 1]
        rx = px * c + py * (-s)
        ry = px * s + py * c
        return jnp.stack([rx, ry], -1) + pos[..., None, :]  # [B,N,T,P,2]

    def onroad_of(x):
        from cld_tpu.ops.pallas_kernels import drivable_bit_gather_pallas

        agt_pts = world_pts(x)
        pix = transform_points(agt_pts.reshape(B, -1, 2), ctx.raster_from_agent)
        pix = jax.lax.stop_gradient(pix.reshape(B, N, T, P, 2))
        H, W = ctx.drivable_map.shape[-2:]
        col = jnp.clip(pix[..., 0].astype(jnp.int32), 0, W - 1)
        row = jnp.clip(pix[..., 1].astype(jnp.int32), 0, H - 1)
        pixq = jnp.stack([col, row], -1).reshape(B, N * T * P, 2)
        vals = drivable_bit_gather_pallas(
            pixq, ctx.drivable_packed, prepacked=True,
            interpret=jax.default_backend() != "tpu",
        )
        return vals.reshape(B, N, T, P) <= 0, agt_pts

    # stage bodies: map carry x -> x' with a tiny data dependency
    def body_rotate2(x):
        ap = world_pts(x)
        d = jnp.mean(ap)
        return x + 1e-12 * d

    def body_gather(x):
        off, _ = onroad_of(x)
        return x + 1e-12 * jnp.sum(off.astype(jnp.float32))

    # fixed onroad for the EDT stages (pose-detached anyway)
    off0, ap0 = jax.jit(onroad_of)(x)
    onroad0 = (~off0).reshape(B, N * T, P)
    jax.block_until_ready(onroad0)

    def body_edt_fwd(x):
        ap = world_pts(x).reshape(B, N * T, P, 2)
        d = _min_dist_separable(jax.lax.stop_gradient(ap), onroad0, rd2, cd2)
        return x + 1e-12 * jnp.mean(d)

    def body_edt_vjp(x):
        def f(xx):
            ap = world_pts(xx).reshape(B, N * T, P, 2)
            d = _min_dist_separable(ap, onroad0, rd2, cd2)
            return jnp.sum(d * (d < 3.0))

        g = jax.grad(f)(x)
        return x + 1e-12 * g

    def body_loss_fwd(x):
        v = loss(x, ctx)
        return x + 1e-12 * jnp.mean(v)

    def body_loss_vjp(x):
        g = jax.grad(lambda xx: jnp.mean(loss(xx, ctx)))(x)
        return x + 1e-12 * g

    def body_noop(x):
        return x + 1e-12

    base = timed("noop", lambda c: body_noop(c))
    timed("rotate", lambda c: body_rotate2(c))
    timed("gather", lambda c: body_gather(c))
    timed("edt_fwd", lambda c: body_edt_fwd(c))
    timed("edt_vjp", lambda c: body_edt_vjp(c))
    timed("loss_fwd", lambda c: body_loss_fwd(c))
    timed("loss_vjp", lambda c: body_loss_vjp(c))
    print(f"(noop baseline {base:.4f} ms includes scan overhead)")


if __name__ == "__main__":
    main()
