"""STRIVE-style adversarial latent optimization.

Capability parity with the STRIVE scenario generator
(`/root/reference/src/tbsim/models/strive.py:110`, reachable through the
STRIVE algo): given a trained generative trajectory model (the latent DM or
a CVAE), optimize the LATENT — not the trajectory — to produce a
safety-critical scenario while a prior-likelihood penalty keeps the
scenario plausible. Functional Adam on z via jax.grad; the whole
optimization jits.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def latent_attack(
    decode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    objective_fn: Callable[[jnp.ndarray], jnp.ndarray],
    z_init: jnp.ndarray,
    prior_weight: float = 0.1,
    lr: float = 0.1,
    steps: int = 50,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Minimize objective(decode(z)) + prior_weight * ||z||^2 / 2 over z.

    The quadratic penalty is the standard-normal prior log-likelihood (the
    STRIVE plausibility regularizer); `objective_fn` maps decoded
    trajectories [.., T, 6] to a scalar adversarial cost (e.g. distance to a
    victim — the collision attack losses in cld_tpu.guidance.losses compose
    directly).

    Returns (z_opt, {objective, prior_penalty} at the optimum). One
    lax.scan; usable under jit.
    """

    def total(z):
        obj = objective_fn(decode_fn(z))
        # STRIVE log-prior ||z||^2 / 2 PER SAMPLE (sum over latent dims,
        # mean over the batch axis only) — a full mean would shrink the
        # plausibility penalty by the latent size
        prior = jnp.mean(0.5 * jnp.sum(z.reshape(z.shape[0], -1) ** 2, axis=-1))
        return obj + prior_weight * prior, (obj, prior)

    grad_fn = jax.grad(lambda z: total(z)[0])

    def body(carry, i):
        z, m, v = carry
        g = grad_fn(z)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g**2
        m_hat = m / (1 - b1 ** (i + 1))
        v_hat = v / (1 - b2 ** (i + 1))
        z = z - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        return (z, m, v), None

    init = (z_init, jnp.zeros_like(z_init), jnp.zeros_like(z_init))
    (z, _, _), _ = jax.lax.scan(body, init, jnp.arange(steps))
    _, (obj, prior) = total(z)
    return z, {"objective": obj, "prior_penalty": prior}
