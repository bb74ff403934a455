#!/usr/bin/env python
"""Real-TPU numeric check of the fused pallas LSTM decode (values + grads).

The stored-dtype matmul change (commit bd30936) only ran in interpret mode
on CPU before this; run on the real chip after any kernel edit:

    python scripts/check_lstm_tpu.py

The compiled pallas path always uses bf16 storage on TPU (f32 accum), so
it is compared against the flax module scan at bf16-class tolerances —
this catches Mosaic-compilation breakage (NaNs, wrong tiles, gross error),
while interpret-mode CPU tests (tests/test_lstm_pallas.py) pin exact
numerics. Exits nonzero on mismatch.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cld_tpu.models.lstm import LSTMVAE
from cld_tpu.ops.lstm_pallas import fused_decode_actions


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-6))


def main():
    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"
    m = LSTMVAE()
    v = m.init({"params": jax.random.key(0)}, jnp.zeros((2, 52, 6)),
               jnp.zeros((2, 256)))
    variables = {"params": {"lstmvae": v["params"]}}
    rng = np.random.default_rng(0)
    T, L = 52, 4

    def flax_fn(z, cond):
        return m.apply({"params": variables["params"]["lstmvae"]}, z, cond,
                       method="decode")

    def pallas_fn(z, cond):
        return fused_decode_actions(variables, z, cond, impl="pallas")

    ok = True
    # sweep every batch regime the artifacts generate: grid=1 (dryrun 16),
    # the bench batch (128), and the ddim50/5-samp decode batch (640 ->
    # multi-program grid, the round-4 scoped-VMEM crash shape). A compile
    # failure at ANY of these is a bench-killing bug.
    for B in (16, 128, 640):
        z = jnp.asarray(rng.normal(size=(B, T, L)), jnp.float32)
        cond = jnp.asarray(rng.normal(size=(B, 256)), jnp.float32)
        want = np.asarray(jax.jit(flax_fn)(z, cond))
        got = np.asarray(jax.jit(pallas_fn)(z, cond), dtype=np.float32)
        e = rel_err(want, got)
        print(f"B={B:4d} fwd  rel err = {e:.3e}  finite={np.isfinite(got).all()}")
        ok &= e < 0.03 and np.isfinite(got).all()

        gw = jax.jit(jax.grad(
            lambda z, c: flax_fn(z, c).sum(), argnums=(0, 1)))(z, cond)
        gg = jax.jit(jax.grad(
            lambda z, c: pallas_fn(z, c).astype(jnp.float32).sum(),
            argnums=(0, 1),
        ))(z, cond)
        for name, a, b in [("dz", gw[0], gg[0]), ("dcond", gw[1], gg[1])]:
            e = rel_err(a, b)
            fin = bool(jnp.all(jnp.isfinite(b)))
            print(f"B={B:4d} {name} rel err = {e:.3e}  finite={fin}")
            ok &= e < 0.05 and fin

    print("LSTM TPU CHECK:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
