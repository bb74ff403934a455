#!/usr/bin/env python
"""Profile the bare TemporalMapUnet denoiser at bench shapes.

Times the current bf16 denoiser (B=128, T=52, D=4, cond=256), compares it
against an equal-FLOPs pure-matmul probe (the MXU floor for this chip), and
optionally captures a perfetto trace (MICRO_TRACE=1) for scripts/parse_trace.py.

Run on an idle box; the tunnel makes the first compile ~1 min.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cld_tpu.models.temporal_unet import TemporalMapUnet

B, T, D, C = 128, 52, 4, 256
DT = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

net = TemporalMapUnet(transition_dim=D, output_dim=D, dim=32, dim_mults=(2, 4, 8), dtype=DT)
x = jnp.zeros((B, T, D), jnp.float32)
cond = jnp.zeros((B, C), jnp.float32)
t = jnp.zeros((B,), jnp.int32)
params = net.init(jax.random.key(0), x, cond, t)


def timeit(fn, args, iters=100, label=""):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = (ca or {}).get("flops", 0)
    r = compiled(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = compiled(*args)
    jax.block_until_ready(r)
    el = (time.perf_counter() - t0) / iters
    tf = flops / el / 1e12 if flops else 0
    print(f"{label:32s} {el*1e3:8.4f} ms  {flops/1e9:7.2f} GF  {tf:6.1f} TF/s  mfu={tf/197:.3f}",
          flush=True)
    return compiled, el


fwd = lambda p, x, c, t: net.apply(p, x, c, t)
compiled, el = timeit(fwd, (params, x, cond, t), label="denoiser fwd (current)")

# equal-ish FLOPs matmul probe: 14.3 GF of [1664,1280]x[1280,256] bf16 matmuls
a = jnp.zeros((1664, 1280), DT)
w = jnp.zeros((13, 1280, 256), DT)


def mm_probe(a, w):
    out = jnp.zeros((1664, 256), jnp.float32)
    for i in range(13):
        out = out + jnp.dot(a, w[i], preferred_element_type=jnp.float32)
    return out


timeit(mm_probe, (a, w), label="matmul probe (14.2 GF)")

if os.environ.get("MICRO_TRACE"):
    tdir = "/tmp/denoiser_trace"
    with jax.profiler.trace(tdir):
        for _ in range(20):
            r = compiled(params, x, cond, t)
        jax.block_until_ready(r)
    print(f"trace written to {tdir}", flush=True)
