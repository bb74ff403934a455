#!/usr/bin/env python
"""Semantic map warp variants at closed-loop scale (Na=32 agents, 512x512x3
world maps, 224x224 egocentric viewports, ratio map_res/pixel = 1).

The closed-loop breakdown (scripts/closed_loop_breakdown.py) attributes
33 ms/replan to the warp's XLA fancy-index gather — 40% of the episode.

Variants (ms per full warp of all 32 agents):
  v0_gather    current: vmapped fancy-index gather, [Hw, Ww, C] f32 map
  v1_packed    3 uint8 channels packed into one f32 mantissa (exact:
               ch0 + 256*ch1 + 65536*ch2 < 2^24) -> 3x fewer gathers +
               VPU unpack
  v2_slice     per-agent 256-window extraction via vmapped dynamic_slice
               (cost of the banded-kernel's XLA phase alone)
  v3_onehot    banded windows + one-hot row-matmul column-select pallas
               kernel (the drivable-gather pattern on scene windows)

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

NA, HW, RS, C = 32, 512, 224, 3
INNER, OUTER = 20, 5


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
    from cld_tpu.ops.geometry import world_from_agent_matrix
    from cld_tpu.ops.raster import warp_to_agent_frame

    rng = np.random.default_rng(0)
    Ns = 4
    world = jnp.asarray(
        (rng.random((Ns, HW, HW, C)) < 0.5).astype(np.float32)
        * rng.integers(1, 4, (Ns, HW, HW, C)).astype(np.float32)
        / 3.0
    )
    scene = jnp.asarray(np.arange(NA) % Ns, jnp.int32)
    pos = jnp.asarray(rng.uniform(-60, 60, (NA, 2)), jnp.float32)
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, NA), jnp.float32)
    res, psize, ec = 0.5, 0.5, (-0.5, 0.0)
    origin = jnp.asarray(np.full((Ns, 2), -HW * res / 2, np.float32))

    def poses(x):
        # jiggle agent poses each iter so nothing hoists
        return pos + 0.01 * x, yaw + 0.001 * x

    def v0(x):
        p, y = poses(x)
        wfa = world_from_agent_matrix(p, y)

        def one(i):
            s = scene[i]
            return warp_to_agent_frame(
                world[s], wfa[i][None], res, origin[s], RS, psize, ec
            )[0]

        sem = jax.vmap(one)(jnp.arange(NA))
        return x + 1.0, jnp.sum(sem)

    # --- v1: mantissa-packed single-channel gather ---
    q = jnp.round(world * 255.0).astype(jnp.float32)  # [Ns,H,W,C] in 0..255
    packed = q[..., 0] + 256.0 * q[..., 1] + 65536.0 * q[..., 2]  # [Ns,H,W]

    cx = (1.0 + ec[0]) / 2.0 * RS
    cy = (1.0 + ec[1]) / 2.0 * RS
    xs = (jnp.arange(RS, dtype=jnp.float32) - cx) * psize
    ys = (jnp.arange(RS, dtype=jnp.float32) - cy) * psize
    gx, gy = jnp.meshgrid(xs, ys)
    grid = jnp.stack([gx, gy], -1).reshape(-1, 2)  # [Q, 2]

    def agent_pix(p, y):
        c, s = jnp.cos(y), jnp.sin(y)
        wx = c[:, None] * grid[None, :, 0] - s[:, None] * grid[None, :, 1] + p[:, None, 0]
        wy = s[:, None] * grid[None, :, 0] + c[:, None] * grid[None, :, 1] + p[:, None, 1]
        ox = origin[scene][:, None, 0]
        oy = origin[scene][:, None, 1]
        ix = jnp.round((wx - ox) / res).astype(jnp.int32)
        iy = jnp.round((wy - oy) / res).astype(jnp.int32)
        valid = (ix >= 0) & (ix < HW) & (iy >= 0) & (iy < HW)
        return jnp.clip(ix, 0, HW - 1), jnp.clip(iy, 0, HW - 1), valid

    def unpack(word, valid):
        w = word.astype(jnp.int32)
        ch0 = (w % 256).astype(jnp.float32)
        ch1 = ((w // 256) % 256).astype(jnp.float32)
        ch2 = (w // 65536).astype(jnp.float32)
        sem = jnp.stack([ch0, ch1, ch2], -1) / 255.0
        return jnp.where(valid[..., None], sem, 0.0)

    def v1(x):
        p, y = poses(x)
        ix, iy, valid = agent_pix(p, y)
        word = packed[scene[:, None], iy, ix]  # [NA, Q]
        sem = unpack(word, valid)
        return x + 1.0, jnp.sum(sem)

    # --- v2: per-agent window extraction cost ---
    WIN = 256

    def v2(x):
        p, y = poses(x)
        wp = (p - origin[scene]) / res
        ox = jnp.clip(jnp.round(wp[:, 0]).astype(jnp.int32) - WIN // 2, 0, HW - WIN)
        oy = jnp.clip(jnp.round(wp[:, 1]).astype(jnp.int32) - WIN // 2, 0, HW - WIN)

        def one(i):
            return jax.lax.dynamic_slice(
                packed[scene[i]], (oy[i], ox[i]), (WIN, WIN)
            )

        win = jax.vmap(one)(jnp.arange(NA))  # [NA, WIN, WIN]
        return x + 1.0, jnp.sum(win)

    # --- v1w: windowed packed gather (v2 extraction + in-window gather) ---
    def v1w(x):
        p, y = poses(x)
        wp = (p - origin[scene]) / res
        ox = jnp.clip(jnp.round(wp[:, 0]).astype(jnp.int32) - WIN // 2, 0, HW - WIN)
        oy = jnp.clip(jnp.round(wp[:, 1]).astype(jnp.int32) - WIN // 2, 0, HW - WIN)

        def one(i):
            return jax.lax.dynamic_slice(
                packed[scene[i]], (oy[i], ox[i]), (WIN, WIN)
            )

        win = jax.vmap(one)(jnp.arange(NA))
        ix, iy, valid = agent_pix(p, y)
        lx = jnp.clip(ix - ox[:, None], 0, WIN - 1)
        ly = jnp.clip(iy - oy[:, None], 0, WIN - 1)
        inwin = valid & (ix - ox[:, None] >= 0) & (ix - ox[:, None] < WIN) \
            & (iy - oy[:, None] >= 0) & (iy - oy[:, None] < WIN)
        word = win[jnp.arange(NA)[:, None], ly, lx]
        sem = unpack(word, inwin)
        return x + 1.0, jnp.sum(sem)

    # --- v3: banded one-hot MXU warp (warp_scene_maps pallas path) ---
    from cld_tpu.ops.raster import warp_scene_maps

    def v3(x):
        p, y = poses(x)
        wfa = world_from_agent_matrix(p, y)
        sem = warp_scene_maps(
            world, origin, res, wfa, scene, RS, psize, ec, impl="pallas"
        )
        return x + 1.0, jnp.sum(sem)

    # correctness: v1 == v0 exactly (values are multiples of 1/3*255 rounding)
    _, s0 = jax.jit(v0)(jnp.zeros(()))
    p0, y0 = poses(jnp.zeros(()))
    wfa0 = world_from_agent_matrix(p0, y0)
    ref = jax.vmap(
        lambda i: warp_to_agent_frame(
            world[scene[i]], wfa0[i][None], res, origin[scene[i]], RS, psize, ec
        )[0]
    )(jnp.arange(NA))
    ix, iy, valid = agent_pix(p0, y0)
    got1 = unpack(packed[scene[:, None], iy, ix], valid).reshape(ref.shape)
    err = float(jnp.max(jnp.abs(got1 - ref)))
    print(f"v1 max err vs v0: {err:.2e} (quantization bound 2e-3)", flush=True)

    wfa0 = world_from_agent_matrix(p0, y0)
    got3 = warp_scene_maps(world, origin, res, wfa0, scene, RS, psize, ec,
                           impl="pallas")
    err3 = float(jnp.max(jnp.abs(got3 - ref)))
    print(f"v3 max err vs v0: {err3:.2e} (quantization bound 2e-3)", flush=True)

    for name, fn in [("v0_gather", v0), ("v1_packed", v1),
                     ("v2_slice", v2), ("v1w_winpack", v1w),
                     ("v3_banded", v3)]:
        print(f"  {name:12s} {timeit(fn, jnp.zeros(())):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
