#!/usr/bin/env python
"""Isolate the raster-encode cost of the guided pipeline: ResNet-18 on
224px x B=128 bf16 (the once-per-100-NFE encode whose amortized share is
~2/3 of the non-UNet open-loop floor). Times the jitted encode with an
INNER-deep fori_loop per dispatch (one dispatch = 20 chained encodes) so
the number is steady-state, not tunnel RPC latency. Run on an idle box.

Also reports FLOPs from the compiled executable and MFU vs the v5e bf16
peak, to place encode on the PARITY.md roofline."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128
INNER = 20
OUTER = 5


def main():
    from bench import build_flagship, compiled_flops, device_peak_flops
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.utils.config import default_config

    compute_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    cfg = default_config()
    cfg.train.training.batch_size = BATCH
    batch = synthetic_batch(seed=0, batch_size=BATCH, raster_size=224)
    if compute_dtype == jnp.bfloat16:
        batch = batch._replace(image=batch.image.astype(jnp.bfloat16))
    batch = jax.tree.map(jax.device_put, batch)
    jax.block_until_ready(batch.image)
    dm_trainer, dm_state = build_flagship(cfg, compute_dtype, batch)

    def one_encode(params, batch, rng):
        _, aux = dm_trainer.encode(batch, rng)
        return aux["cond_feat"]

    # FLOPs of a single encode (for MFU)
    single = jax.jit(one_encode).lower(
        dm_state.params, batch, jax.random.key(0)
    ).compile()
    flops = compiled_flops(single)

    @jax.jit
    def run(params, batch, rng):
        def it(i, acc):
            # feed acc back into the image so every iteration's encode
            # depends on the previous one — without this the encode is
            # loop-invariant and XLA hoists it out (measured 0.66 ms for
            # 20 "iterations", an impossible 5.7 MFU)
            b = batch._replace(
                image=batch.image + (acc * 1e-30).astype(batch.image.dtype)
            )
            r = jax.random.fold_in(rng, i)
            return acc + one_encode(params, b, r).sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, INNER, it, jnp.zeros(()))

    r = run(dm_state.params, batch, jax.random.key(1))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(OUTER):
        r = run(dm_state.params, batch, jax.random.key(2))
    jax.block_until_ready(r)
    per_call = (time.perf_counter() - t0) / (OUTER * INNER)
    peak = device_peak_flops(jax.devices()[0].device_kind)
    line = f"encode {per_call*1e3:.3f} ms/call  ({per_call*1e3/100:.4f} ms amortized per NFE)"
    if flops and peak:
        line += f"  flops={flops/1e9:.1f} GF  mfu={flops/per_call/peak:.3f}"
    print(line)


if __name__ == "__main__":
    main()
