#!/usr/bin/env python
"""Drivable-map lookup variants at bench scale (B=128, Q=5200, 224x224 map).

Variants (each timed as a deep fori_loop, ms/iter; all verified against the
fancy-index reference first):
  px_pallas    unpacked int8 one-hot matmul kernel (drivable_gather_pallas)
  bit_pallas   bit-packed kernel incl. per-iter pack (what a scan body pays
               today: XLA does not hoist the pack out of a while loop)
  bit_prepack  bit-packed kernel, map packed once outside the loop
  xla_byte     pure-XLA take_along_axis of packed bytes + VPU bit peel
  xla_gather   pure-XLA fancy-index gather on the raw f32 map (original)

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


def main():
    from cld_tpu.ops.pallas_kernels import (
        drivable_bit_gather_pallas,
        drivable_gather_pallas,
        pack_drivable_bits,
    )

    rng = np.random.default_rng(0)
    drv = jnp.asarray(rng.random((B, HW, HW)) - 0.3, jnp.float32)
    drv8 = (drv > 0).astype(jnp.int8)
    packed = pack_drivable_bits(drv)  # [B, H, W8]
    pix0 = jnp.asarray(
        np.stack(
            [rng.integers(0, HW, (B, Q)), rng.integers(0, HW, (B, Q))], axis=-1
        ),
        jnp.int32,
    )

    want = np.asarray(
        drv[jnp.arange(B)[:, None], pix0[..., 1], pix0[..., 0]] > 0, np.float32
    )

    # ---- variants (each: pix -> [B, Q] onroad {0,1} f32) ----
    def px_pallas(pix):
        return drivable_gather_pallas(pix, drv8)

    def bit_pallas(pix):
        # pack INSIDE the timed body: what the sampling scan pays today
        return drivable_bit_gather_pallas(pix, drv)

    def bit_prepack(pix):
        from cld_tpu.ops.pallas_kernels import _bit_gather_kernel  # noqa: F401

        return drivable_bit_gather_pallas(pix, packed, prepacked=True)

    W8 = packed.shape[-1]

    def xla_byte(pix):
        flat = pix[..., 1] * W8 + (pix[..., 0] >> 3)  # [B, Q] byte index
        bytes_ = jnp.take_along_axis(
            packed.reshape(B, -1).astype(jnp.int32), flat, axis=1
        )
        return ((bytes_ >> (pix[..., 0] & 7)) & 1).astype(jnp.float32)

    def xla_gather(pix):
        b_idx = jnp.arange(B)[:, None]
        return (drv[b_idx, pix[..., 1], pix[..., 0]] > 0).astype(jnp.float32)

    variants = [
        ("px_pallas", px_pallas),
        ("bit_pallas", bit_pallas),
        ("bit_prepack", bit_prepack),
        ("xla_byte", xla_byte),
        ("xla_gather", xla_gather),
    ]
    for name, fn in variants:
        got = np.asarray(fn(pix0))
        ok = bool((got == want).all())
        print(f"  {name:12s} correct={ok}", flush=True)
        if not ok:
            continue

        def body(pix, fn=fn):
            v = fn(pix)
            s = jnp.sum(v)
            # perturb indices so the loop can't be constant-folded
            return (pix + 1) % HW, s

        print(f"  {name:12s} {timeit(body, pix0):.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
