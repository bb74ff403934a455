#!/usr/bin/env python
"""Debug: compare rigid fwd dist/idx XLA vs pallas directly on TPU."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cld_tpu.guidance.losses import _min_dist_rigid_core
from cld_tpu.ops.pallas_kernels import rigid_min_pallas

rng = np.random.default_rng(0)
B, Q, P = 128, 52, 100
pts_local = jnp.asarray(rng.normal(0, 2, (B, P, 2)), jnp.float32)
d2 = jnp.sum((pts_local[:, :, None] - pts_local[:, None]) ** 2, -1)
on = jnp.asarray(rng.random((B, Q, P)) > 0.3)

d_x, i_x = jax.jit(lambda d2, on: _min_dist_rigid_core(d2[:, None], on))(d2, on)
d_p, i_p = jax.jit(rigid_min_pallas)(d2, on)
d_x, i_x, d_p, i_p = map(np.asarray, (d_x, i_x, d_p, i_p))
print("dist mismatches:", int((~np.isclose(d_x, d_p, rtol=1e-5)).sum()), "/", d_x.size)
print("idx mismatches:", int((i_x != i_p).sum()), "/", i_x.size)
bad = ~np.isclose(d_x, d_p, rtol=1e-5)
if bad.any():
    w = np.argwhere(bad)[:10]
    for b, q, j in w:
        print(
            f"  b={b} q={q} j={j}: xla d={d_x[b,q,j]:.6f} i={i_x[b,q,j]}  "
            f"pal d={d_p[b,q,j]:.6f} i={i_p[b,q,j]}  on_j={bool(on[b,q,j])}  "
            f"n_onroad={int(np.asarray(on[b,q]).sum())}"
        )
ib = i_x != i_p
if ib.any():
    w = np.argwhere(ib)[:10]
    for b, q, j in w:
        print(
            f"  idx b={b} q={q} j={j}: xla i={i_x[b,q,j]} pal i={i_p[b,q,j]} "
            f"d2[xla]={float(d2[b, i_x[b,q,j], j]):.6f} "
            f"d2[pal]={float(d2[b, i_p[b,q,j], j]):.6f}"
        )
