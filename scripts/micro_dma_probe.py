#!/usr/bin/env python
"""Minimal probe: which ANY->VMEM scratch DMA patterns Mosaic accepts.

Round-4 v2 LSTM backward failed with 'Slice shape along dimension 2 must be
aligned to tiling (128), but is 64' on the real chip; this isolates whether
the offender is (a) minor dim 64 on the scratch, (b) the batch-axis slice of
the ANY source, or (c) neither alone.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

T, B, H = 52, 128, 64
bb = 64


def run(case, minor, slice_batch):
    def kern(x_any, o_ref, st, sem):
        b = pl.program_id(0)
        src = x_any.at[:, pl.ds(b * bb, bb), :] if slice_batch else x_any
        cp = pltpu.make_async_copy(src, st, sem)
        cp.start()
        cp.wait()
        o_ref[...] = st[...] * 2.0

    Bp = B if slice_batch else bb
    x = jnp.arange(T * Bp * minor, dtype=jnp.bfloat16).reshape(T, Bp, minor) * 1e-3
    out = pl.pallas_call(
        kern,
        grid=(Bp // bb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((T, bb, minor), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Bp, minor), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((T, bb, minor), jnp.bfloat16), pltpu.SemaphoreType.DMA],
    )(x)
    got = np.asarray(out, np.float32)
    want = np.asarray(x, np.float32) * 2
    ok = np.allclose(got, want, rtol=1e-2)
    print(f"{case}: compiled, correct={ok}", flush=True)


for case, minor, sl in [
    ("minor=128, full-copy   ", 128, False),
    ("minor=64,  full-copy   ", 64, False),
    ("minor=128, batch-slice ", 128, True),
    ("minor=64,  batch-slice ", 64, True),
]:
    try:
        run(case, minor, sl)
    except Exception as e:
        msg = str(e).split("\n")
        key = [l for l in msg if "Mosaic" in l or "aligned" in l or "INTERNAL" in l]
        print(f"{case}: FAILED  {key[-1][:140] if key else msg[0][:140]}", flush=True)
