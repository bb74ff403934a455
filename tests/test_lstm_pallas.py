"""Fused pallas LSTM decoder == flax LSTMVAE.decode (values + all grads)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cld_tpu.models.lstm import LSTMVAE
from cld_tpu.ops.lstm_pallas import (
    extract_decoder_params,
    fused_decode_actions,
    lstm2_core,
    lstm2_core_ref,
)


@pytest.fixture(scope="module")
def vae_and_vars():
    m = LSTMVAE()
    v = m.init(
        {"params": jax.random.key(0)},
        jnp.zeros((2, 52, 6)),
        jnp.zeros((2, 256)),
    )
    # wrap like VaeModel variables: params/lstmvae/lstm_dec/...
    return m, {"params": {"lstmvae": v["params"]}}


def _flax_decode(m, variables, z, cond):
    return m.apply(
        {"params": variables["params"]["lstmvae"]}, z, cond, method="decode"
    )


def test_ref_matches_flax_decode(vae_and_vars):
    m, variables = vae_and_vars
    rng = np.random.default_rng(0)
    B, T, L = 5, 52, 4
    z = jnp.asarray(rng.normal(size=(B, T, L)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, 256)), jnp.float32)
    want = _flax_decode(m, variables, z, cond)
    got = fused_decode_actions(variables, z, cond, impl="ref")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pallas_fwd_matches_ref(vae_and_vars):
    m, variables = vae_and_vars
    rng = np.random.default_rng(1)
    # odd B exercises the batch-block padding; short T exercises t==0 edges
    for B, T in [(3, 52), (9, 7)]:
        z = jnp.asarray(rng.normal(size=(B, T, 4)), jnp.float32)
        cond = jnp.asarray(rng.normal(size=(B, 256)), jnp.float32)
        want = fused_decode_actions(variables, z, cond, impl="ref")
        got = fused_decode_actions(variables, z, cond, impl="interpret")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )


def test_pallas_grads_match_flax(vae_and_vars):
    """d/dz, d/dcond, and d/dweights of the fused path == jax.grad of the
    flax decode (f32, interpret mode)."""
    m, variables = vae_and_vars
    rng = np.random.default_rng(2)
    B, T = 3, 13
    z = jnp.asarray(rng.normal(size=(B, T, 4)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, 256)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(B, T, 2)), jnp.float32)

    def loss_flax(variables, z, cond):
        return jnp.sum(_flax_decode(m, variables, z, cond) * ct)

    def loss_fused(variables, z, cond):
        return jnp.sum(fused_decode_actions(variables, z, cond, impl="interpret") * ct)

    gw_f, gz_f, gc_f = jax.grad(loss_flax, argnums=(0, 1, 2))(variables, z, cond)
    gw_p, gz_p, gc_p = jax.grad(loss_fused, argnums=(0, 1, 2))(variables, z, cond)
    np.testing.assert_allclose(np.asarray(gz_p), np.asarray(gz_f), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_f), rtol=1e-4, atol=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(
        gw_f["params"]["lstmvae"]["lstm_dec"]
    )
    flat_p = dict(
        jax.tree_util.tree_leaves_with_path(gw_p["params"]["lstmvae"]["lstm_dec"])
    )
    for path, leaf in flat_f:
        got = flat_p[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), rtol=1e-4, atol=1e-5,
            err_msg=f"weight grad mismatch at {path}",
        )


def test_core_bf16_smoke(vae_and_vars):
    """bf16 storage path executes and stays close to the f32 reference."""
    m, variables = vae_and_vars
    rng = np.random.default_rng(3)
    B, T = 4, 11
    p = extract_decoder_params(variables["params"]["lstmvae"]["lstm_dec"])
    z = jnp.asarray(rng.normal(size=(B, T, 4)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, 256)), jnp.float32)
    xg1 = z @ p.Wx1 + p.b1
    h0 = cond @ p.Wc + p.bc
    want, _, _, _ = lstm2_core_ref(xg1, h0, p.Wh1, p.W2, p.b2)
    got = lstm2_core(
        xg1.astype(jnp.bfloat16), h0.astype(jnp.bfloat16),
        p.Wh1.astype(jnp.bfloat16), p.W2.astype(jnp.bfloat16),
        p.b2.astype(jnp.bfloat16), True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.1, atol=0.05
    )
