#!/usr/bin/env python
"""TPU correctness + timing check of the MapCollisionLoss fast path
(bit-packed gather + fused rigid masked-min) vs the pure-jnp reference
path, at bench scale. Prints max abs diffs and the loss_vg timing."""

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
    from cld_tpu.guidance.losses import GuidanceContext, MapCollisionLoss
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
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, N, T, 6)) * 2.0

    fast = MapCollisionLoss()  # auto: pallas gather + fused min on TPU
    ref = MapCollisionLoss(gather_impl="jnp", min_dist_impl="pairwise")

    vf, gf = jax.jit(jax.value_and_grad(lambda x: jnp.sum(fast(x, ctx))))(x0)
    vr, gr = jax.jit(jax.value_and_grad(lambda x: jnp.sum(ref(x, ctx))))(x0)
    print(f"value fast={float(vf):.6f} ref={float(vr):.6f} "
          f"dv={abs(float(vf - vr)):.2e}")
    print(f"grad max abs diff = {float(jnp.max(jnp.abs(gf - gr))):.2e} "
          f"(grad scale {float(jnp.max(jnp.abs(gr))):.2e})")

    vg = jax.value_and_grad(lambda x: jnp.sum(fast(x, ctx)))

    def body(x):
        v, g = vg(x)
        return x + 1e-6 * g, v

    t = timeit(body, x0)
    print(f"loss_vg (fast path) {t:.4f} ms/iter  (was 1.0376)")


if __name__ == "__main__":
    main()
