#!/usr/bin/env python
"""Microbenchmark: rigid map-collision masked-min fwd/bwd — XLA vs pallas.

Run ONLY on an otherwise idle box (CLAUDE.md: TPU timings are garbage while
anything CPU-heavy runs on the host). Shapes mirror the flagship bench
(B=128 agents, Q=52 horizon, P=100 bbox points) and the closed-loop case
(B=32).
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

from cld_tpu.guidance.losses import _min_dist_rigid, _min_dist_rigid_pallas


def timeit(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    for B, Q, P in [(128, 52, 100), (32, 52, 100)]:
        pts_local = jnp.asarray(rng.normal(0, 2, (B, P, 2)), jnp.float32)
        d2 = jnp.sum((pts_local[:, :, None] - pts_local[:, None]) ** 2, -1)
        on = jnp.asarray(rng.random((B, Q, P)) > 0.3)
        pts = jnp.asarray(rng.normal(0, 5, (B, Q, P, 2)), jnp.float32)
        g = jnp.asarray(rng.normal(0, 1, (B, Q, P)), jnp.float32)
        g = jnp.where(on, 0.0, g)

        # rigid XLA path expects d2 as [1, B, 1, P, P] inside the chunk scan;
        # here we call the raw custom-vjp ops directly on [B, Q, P] layouts
        def fwd_xla(pts, d2, on):
            return _min_dist_rigid(pts, d2[:, None], on).sum()

        def fwd_pal(pts, d2, on):
            return _min_dist_rigid_pallas(pts, d2, on, False).sum()

        def grad_xla(pts, d2, on, g):
            return jax.grad(
                lambda p: (_min_dist_rigid(p, d2[:, None], on) * g).sum()
            )(pts)

        def grad_pal(pts, d2, on, g):
            return jax.grad(
                lambda p: (_min_dist_rigid_pallas(p, d2, on, False) * g).sum()
            )(pts)

        jf_x = jax.jit(fwd_xla)
        jf_p = jax.jit(fwd_pal)
        jg_x = jax.jit(grad_xla)
        jg_p = jax.jit(grad_pal)

        # numerics check: the XLA path's one-hot einsum runs at TPU default
        # matmul precision (bf16 passes) in production; at forced f32 both
        # paths agree exactly (the pallas VPU math is full f32)
        vx = jf_x(pts, d2, on)
        vp = jf_p(pts, d2, on)
        np.testing.assert_allclose(np.asarray(vx), np.asarray(vp), rtol=1e-5)
        with jax.default_matmul_precision("float32"):
            gx = jax.jit(grad_xla)(pts, d2, on, g)
        gp = jg_p(pts, d2, on, g)
        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(gp), rtol=1e-3, atol=1e-4
        )

        t_fx = timeit(jf_x, pts, d2, on)
        t_fp = timeit(jf_p, pts, d2, on)
        t_gx = timeit(jg_x, pts, d2, on, g)
        t_gp = timeit(jg_p, pts, d2, on, g)
        print(
            f"B={B} Q={Q} P={P}:  fwd xla {t_fx*1e3:.3f} ms  "
            f"pallas {t_fp*1e3:.3f} ms  |  fwd+bwd xla {t_gx*1e3:.3f} ms  "
            f"pallas {t_gp*1e3:.3f} ms"
        )


if __name__ == "__main__":
    main()
