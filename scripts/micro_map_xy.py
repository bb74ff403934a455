#!/usr/bin/env python
"""A/B the MapCollisionLoss separable routing backward vs the separable_xy
moment backward on the real chip at bench scale (B=128, N=1, T=52, P=100),
with the prepacked context the guided pipeline uses (bit-packed drivable,
bbox grid). Times jitted value_and_grad per iteration (INNER-deep fori_loop
per dispatch). Run on an idle box only."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

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
        MapCollisionLoss,
        prepack_drivable,
        prepack_map_bbox,
    )
    from cld_tpu.ops.geometry import world_from_agent_matrix

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
    ctx = prepack_map_bbox(prepack_drivable(ctx), (10, 10), with_d2=False)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, N, T, 6)) * 2.0

    for name, kw in [
        ("separable", dict(min_dist_impl="separable")),
        ("separable_xy", dict(min_dist_impl="separable_xy")),
    ]:
        loss = MapCollisionLoss(**kw)
        vg = jax.value_and_grad(lambda x: jnp.sum(loss(x, ctx)))

        def body(x):
            v, g = vg(x)
            return x + 1e-6 * g, v

        t = timeit(body, x0)
        print(f"{name:14s} {t:.4f} ms/iter")


if __name__ == "__main__":
    main()
