#!/usr/bin/env python
"""Micro-breakdown of MapCollisionLoss on the real chip: which internal
stage costs what at bench scale (B=128, N=1, T=52, P=100, 224px maps).

Per-dispatch tunnel latency here is ~1 ms, so every stage runs INNER=100
iterations inside one jitted lax.fori_loop (data-dependent perturbation of
the input each round defeats CSE/hoisting) and we report per-iteration time.

Stages:
  loss_fwd    forward of the full loss
  loss_vg     value_and_grad of the full loss wrt x   (the real guided cost)
  gather      the pallas int8 drivable gather alone
  min_fwd     _min_dist_rigid forward alone
  min_vg      _min_dist_rigid fwd+bwd

Run on an idle box only (CLAUDE.md measurement-contamination note).
"""

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
    """body: (x) -> (x', scalar); time INNER iterations inside one jit."""

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
    return (time.perf_counter() - t0) / (OUTER * INNER) * 1e3  # ms/iter


def main():
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import (
        GuidanceContext,
        MapCollisionLoss,
        _min_dist_rigid,
    )
    from cld_tpu.ops.geometry import world_from_agent_matrix
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
    loss = MapCollisionLoss()

    def total(x):
        return jnp.sum(loss(x, ctx))

    grad_total = jax.value_and_grad(total)
    r = {}
    r["loss_fwd"] = timeit(lambda x: (x + 1e-6, total(x)), x0)

    def vg_body(x):
        v, g = grad_total(x)
        return x + 1e-6 * g, v

    r["loss_vg"] = timeit(vg_body, x0)

    # gather alone at production shape: Q = N*T*P points per agent
    Q = N * T * P
    pix0 = jax.random.randint(jax.random.PRNGKey(1), (B, Q, 2), 0, RASTER)
    drv8 = (ctx.drivable_map > 0).astype(jnp.int8)

    def gather_body(pix):
        v = drivable_gather_pallas(pix, drv8)
        pix2 = (pix + v[..., None].astype(jnp.int32) + 1) % RASTER
        return pix2, jnp.sum(v)

    r["gather"] = timeit(gather_body, pix0)

    # rigid masked-min at production shape
    pts0 = jax.random.normal(jax.random.PRNGKey(2), (B, N * T, P, 2))
    d2l = jax.random.uniform(jax.random.PRNGKey(3), (B, 1, P, P)) + 0.01
    onroad = jax.random.bernoulli(jax.random.PRNGKey(4), 0.7, (B, N * T, P))

    def md(pts):
        return jnp.sum(_min_dist_rigid(pts, d2l, onroad))

    md_vg = jax.value_and_grad(md)
    r["min_fwd"] = timeit(lambda p: (p + 1e-6, md(p)), pts0)

    def md_body(p):
        v, g = md_vg(p)
        return p + 1e-6 * g, v

    r["min_vg"] = timeit(md_body, pts0)

    print(f"\nB={B} N={N} T={T} P={P} raster={RASTER} inner={INNER}")
    for k, v in r.items():
        print(f"  {k:10s} {v:8.4f} ms/iter")


if __name__ == "__main__":
    main()
