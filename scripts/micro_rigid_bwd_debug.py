#!/usr/bin/env python
"""Debug: compare rigid bwd pallas vs jnp reference directly on TPU."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cld_tpu.ops.pallas_kernels import rigid_bwd_pallas, rigid_bwd_ref, rigid_min_pallas

rng = np.random.default_rng(0)
B, Q, P = 128, 52, 100
pts_local = jnp.asarray(rng.normal(0, 2, (B, P, 2)), jnp.float32)
d2 = jnp.sum((pts_local[:, :, None] - pts_local[:, None]) ** 2, -1)
on = jnp.asarray(rng.random((B, Q, P)) > 0.3)
dist, idx = jax.jit(rigid_min_pallas)(d2, on)

pts = jnp.asarray(rng.normal(0, 5, (B, Q, P, 2)), jnp.float32)
g = jnp.asarray(rng.normal(0, 1, (B, Q, P)), jnp.float32)
g = jnp.where(on, 0.0, g)

with jax.default_matmul_precision("float32"):
    g_ref = np.asarray(jax.jit(rigid_bwd_ref)(pts, idx, dist, g))
g_pal = np.asarray(jax.jit(rigid_bwd_pallas)(pts, idx, dist, g))
bad = ~np.isclose(g_ref, g_pal, rtol=1e-3, atol=1e-4)
print("grad mismatches:", int(bad.sum()), "/", g_ref.size)
if bad.any():
    w = np.argwhere(bad)
    print("mismatch b range:", w[:, 0].min(), w[:, 0].max())
    print("mismatch q range:", w[:, 1].min(), w[:, 1].max())
    print("mismatch i range:", w[:, 2].min(), w[:, 2].max())
    for b, q, i, c in w[:10]:
        print(
            f"  b={b} q={q} i={i} c={c}: ref={g_ref[b,q,i,c]:.5f} "
            f"pal={g_pal[b,q,i,c]:.5f}"
        )
