#!/usr/bin/env python
"""Micro-breakdown of the guidance decode indirection at bench scale:
what the per-denoise-step decoder VJP actually costs, split into LSTM
decode vs unicycle integration vs the full decode_fn chain.

Stages (each timed as an INNER-deep jitted fori_loop, ms/iter):
  lstm_fwd     LSTM decoder forward only
  lstm_vjp     LSTM decoder fwd + cotangent pullback
  dec_vjp      full decode_fn (LSTM + unicycle + descale) fwd + pullback
  uni_vjp      unicycle integration fwd + pullback alone

Run on an idle box only (CLAUDE.md measurement-contamination note)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, T, L = 128, 52, 4
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
    from cld_tpu.data.batch import get_current_states
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.models.vae import VaeModel, convert_action_to_state_and_action
    from cld_tpu.ops.dynamics import UnicycleParams
    from cld_tpu.ops.normalization import TrajNormalizer
    from cld_tpu.utils.config import default_config

    cfg = default_config()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    batch = synthetic_batch(seed=0, batch_size=B, raster_size=224)
    vae = VaeModel(dtype=dtype)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    vae_vars = jax.jit(lambda r, b: vae.init(r, b, 0.05))(rngs, batch)
    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    normalizer = TrajNormalizer()
    curr = get_current_states(batch)
    cond = jnp.zeros((B, cfg.algo.cond_feat_dim), jnp.float32)
    z0 = jax.random.normal(jax.random.key(2), (B, T, L))

    def lstm_dec(z):
        return vae.apply(vae_vars, z, cond, method="decode")

    def decode_full(z):
        acts = lstm_dec(z)
        return convert_action_to_state_and_action(
            acts, curr, dyn, normalizer, descaled_output=True
        )

    acts0 = jax.jit(lstm_dec)(z0)

    def uni_only(a):
        return convert_action_to_state_and_action(
            a, curr, dyn, normalizer, descaled_output=True
        )

    def mk_vjp(f, ct_like):
        def body(x):
            y, pull = jax.vjp(f, x)
            (dx,) = pull(ct_like(y))
            return x + 1e-6 * dx.astype(x.dtype), jnp.sum(y.astype(jnp.float32))
        return body

    def mk_fwd(f):
        def body(x):
            y = f(x)
            s = jnp.sum(y.astype(jnp.float32))
            return x + 1e-9 * s, s
        return body

    from cld_tpu.models.vae import decode_actions

    def lstm_fused(z):
        return decode_actions(vae, vae_vars, z, cond, impl="pallas")

    def decode_full_fused(z):
        acts = lstm_fused(z)
        return convert_action_to_state_and_action(
            acts, curr, dyn, normalizer, descaled_output=True
        )

    ones = lambda y: jnp.ones_like(y)
    print(f"lstm_fwd        {timeit(mk_fwd(lstm_dec), z0):.4f} ms/iter")
    print(f"lstm_vjp        {timeit(mk_vjp(lstm_dec, ones), z0):.4f} ms/iter")
    print(f"dec_vjp         {timeit(mk_vjp(decode_full, ones), z0):.4f} ms/iter")
    print(f"uni_vjp         {timeit(mk_vjp(uni_only, ones), acts0.astype(jnp.float32)):.4f} ms/iter")
    print(f"lstm_fused_fwd  {timeit(mk_fwd(lstm_fused), z0):.4f} ms/iter")
    print(f"lstm_fused_vjp  {timeit(mk_vjp(lstm_fused, ones), z0):.4f} ms/iter")
    print(f"dec_fused_vjp   {timeit(mk_vjp(decode_full_fused, ones), z0):.4f} ms/iter")


if __name__ == "__main__":
    main()
