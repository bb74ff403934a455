#!/usr/bin/env python
"""Microbenchmark: f32 vs bf16 compute for the rigid masked-min fwd/bwd.

The masked min over [B, Q, P, P] is VPU-compute-bound (666M element ops at
bench scale); bf16 doubles VPU lanes. The backward's exact-equality row
recovery still works in bf16 (the recompute repeats the forward's ops
bitwise), and tie-splitting absorbs the coarser rounding. Final gradient
assembly stays f32.

Run ONLY on an otherwise idle box (CLAUDE.md).
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

from cld_tpu.guidance.losses import _min_dist_rigid

_BIG = jnp.float32(1e12)
_BIG_BF16 = jnp.bfloat16(1e12)


@jax.custom_vjp
def min_dist_bf16(pts, d2_local, onroad):
    d2 = jnp.where(onroad[..., :, None], d2_local.astype(jnp.bfloat16), _BIG_BF16)
    m2 = jnp.min(d2, axis=-2)
    return jnp.sqrt(m2.astype(jnp.float32) + 1e-12)


def _fwd(pts, d2_local, onroad):
    d2 = jnp.where(onroad[..., :, None], d2_local.astype(jnp.bfloat16), _BIG_BF16)
    m2 = jnp.min(d2, axis=-2)
    return jnp.sqrt(m2.astype(jnp.float32) + 1e-12), (pts, d2_local, onroad, m2)


def _bwd(res, g):
    pts, d2_local, onroad, m2 = res
    d2 = jnp.where(onroad[..., :, None], d2_local.astype(jnp.bfloat16), _BIG_BF16)
    eq = (d2 == m2[..., None, :]).astype(jnp.float32)
    cnt = jnp.sum(eq, axis=-2)
    a = g / jnp.sqrt(m2.astype(jnp.float32) + 1e-12) / jnp.maximum(cnt, 1.0)
    s_a = jnp.einsum("...ij,...j->...i", eq, a)
    s_apx = jnp.einsum("...ij,...j->...i", eq, a * pts[..., 0])
    s_apy = jnp.einsum("...ij,...j->...i", eq, a * pts[..., 1])
    s_ap = jnp.stack([s_apx, s_apy], axis=-1)
    return pts * s_a[..., None] - s_ap, None, None


min_dist_bf16.defvjp(_fwd, _bwd)


def timeit(fn, *args, iters=30):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    for B, Q, P in [(128, 52, 100), (100, 52, 100)]:
        pts_local = jnp.asarray(rng.normal(0, 2, (B, P, 2)), jnp.float32)
        d2 = jnp.sum((pts_local[:, :, None] - pts_local[:, None]) ** 2, -1)
        on = jnp.asarray(rng.random((B, Q, P)) > 0.3)
        pts = jnp.asarray(rng.normal(0, 5, (B, Q, P, 2)), jnp.float32)
        g = jnp.asarray(rng.normal(0, 1, (B, Q, P)), jnp.float32)
        g = jnp.where(on, 0.0, g)

        def fwd_f32(pts, d2, on):
            return _min_dist_rigid(pts, d2[:, None], on).sum()

        def fwd_b16(pts, d2, on):
            return min_dist_bf16(pts, d2[:, None], on).sum()

        def grad_f32(pts, d2, on, g):
            return jax.grad(
                lambda p: (_min_dist_rigid(p, d2[:, None], on) * g).sum()
            )(pts)

        def grad_b16(pts, d2, on, g):
            return jax.grad(
                lambda p: (min_dist_bf16(p, d2[:, None], on) * g).sum()
            )(pts)

        jf32, jb16 = jax.jit(fwd_f32), jax.jit(fwd_b16)
        jg32, jg16 = jax.jit(grad_f32), jax.jit(grad_b16)

        v32 = np.asarray(jf32(pts, d2, on))
        v16 = np.asarray(jb16(pts, d2, on))
        rel = np.max(np.abs(v16 - v32) / np.maximum(np.abs(v32), 1e-3))
        g32 = np.asarray(jg32(pts, d2, on, g))
        g16 = np.asarray(jg16(pts, d2, on, g))
        # cosine similarity of the flattened gradient (direction quality)
        cos = float(
            np.dot(g32.ravel(), g16.ravel())
            / (np.linalg.norm(g32) * np.linalg.norm(g16) + 1e-12)
        )

        t_f32 = timeit(jf32, pts, d2, on)
        t_f16 = timeit(jb16, pts, d2, on)
        t_g32 = timeit(jg32, pts, d2, on, g)
        t_g16 = timeit(jg16, pts, d2, on, g)
        print(
            f"B={B} Q={Q} P={P}:  fwd f32 {t_f32*1e3:.3f} bf16 {t_f16*1e3:.3f} ms"
            f"  |  fwd+bwd f32 {t_g32*1e3:.3f} bf16 {t_g16*1e3:.3f} ms"
            f"  |  fwd rel-err {rel:.2e}  grad cos {cos:.6f}"
        )


if __name__ == "__main__":
    main()
