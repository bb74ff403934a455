#!/usr/bin/env python
"""In-kernel variants of the bit-packed drivable gather, to localize the
0.21 ms/iter cost (theory says ~0.07): bf16 vs int8 one-hot, agents-per-
program, and query-tile width. All variants verified exact first.

Run on an idle box only.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, Q, HW = 128, 5200, 224
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


def _kernel(rows_ref, cols_ref, mapt_ref, out_ref, *, oh_dtype):
    AB, QC = rows_ref.shape
    _, W8, H = mapt_ref.shape
    acc_t = jnp.int32 if oh_dtype == jnp.int8 else jnp.float32
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, QC), 0)
    iw8 = jax.lax.broadcasted_iota(jnp.int32, (W8, QC), 0)
    for a in range(AB):
        mt = mapt_ref[a].astype(oh_dtype)
        oh = (ih == rows_ref[a : a + 1, :]).astype(oh_dtype)
        g = jnp.dot(mt, oh, preferred_element_type=acc_t)
        cm = iw8 == jax.lax.shift_right_logical(cols_ref[a : a + 1, :], 3)
        word = jnp.sum(jnp.where(cm, g, 0), axis=0)[None, :].astype(jnp.int32)
        bit = jax.lax.shift_right_logical(
            word & 0xFF, cols_ref[a : a + 1, :] & 7
        ) & 1
        out_ref[a, :] = bit[0].astype(jnp.float32)


def make_gather(ab, qc, oh_dtype):
    def gather(pix, packed):
        Bp, H, W8 = packed.shape
        qpad = (-Q) % qc
        pixp = jnp.pad(pix, ((0, 0), (0, qpad), (0, 0))) if qpad else pix
        Qp = Q + qpad
        rows = pixp[..., 1]
        cols = pixp[..., 0]
        mapt = jnp.swapaxes(packed, 1, 2)
        if oh_dtype != jnp.int8:
            mapt = jnp.where(mapt < 0, mapt.astype(jnp.int32) + 256, mapt)
            mapt = mapt.astype(oh_dtype)
        pt_spec = pl.BlockSpec((ab, qc), lambda b, q: (b, q), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel, oh_dtype=oh_dtype),
            grid=(Bp // ab, Qp // qc),
            in_specs=[
                pt_spec,
                pt_spec,
                pl.BlockSpec((ab, mapt.shape[1], H), lambda b, q: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pt_spec,
            out_shape=jax.ShapeDtypeStruct((Bp, Qp), jnp.float32),
        )(rows, cols, mapt)
        return out[:, :Q]

    return gather


def main():
    from cld_tpu.ops.pallas_kernels import pack_drivable_bits

    rng = np.random.default_rng(0)
    drv = jnp.asarray(rng.random((B, HW, HW)) - 0.3, jnp.float32)
    packed = pack_drivable_bits(drv)
    pix0 = jnp.asarray(
        np.stack(
            [rng.integers(0, HW, (B, Q)), rng.integers(0, HW, (B, Q))], axis=-1
        ),
        jnp.int32,
    )
    want = np.asarray(
        drv[jnp.arange(B)[:, None], pix0[..., 1], pix0[..., 0]] > 0, np.float32
    )

    for name, ab, qc, dt in [
        ("i8 ab8 qc2048 ", 8, 2048, jnp.int8),
        ("i8 ab16 qc2048", 16, 2048, jnp.int8),
        ("i8 ab8 qc4096 ", 8, 4096, jnp.int8),
        ("i8 ab32 qc1024", 32, 1024, jnp.int8),
        ("bf ab8 qc2048 ", 8, 2048, jnp.bfloat16),
        ("bf ab16 qc2048", 16, 2048, jnp.bfloat16),
        ("f32 ab8 qc2048", 8, 2048, jnp.float32),
    ]:
        fn = make_gather(ab, qc, dt)
        try:
            got = np.asarray(fn(pix0, packed))
        except Exception as e:
            print(f"  {name} FAILED: {str(e)[:120]}", flush=True)
            continue
        ok = bool((got == want).all())
        if not ok:
            print(f"  {name} WRONG", flush=True)
            continue

        def body(pix, fn=fn):
            v = fn(pix, packed)
            return (pix + 1) % HW, jnp.sum(v)

        print(f"  {name} {timeit(body, pix0):.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
