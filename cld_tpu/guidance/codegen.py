"""LLM-generated guidance losses (gated).

Capability parity with the reference's GPT loss hook
(`/root/reference/src/tbsim/utils/gpt_utils.py:40` query_gpt +
`guidance_loss.py:1540` GPTLoss): the reference asks an LLM to synthesize a
guidance-loss function from a natural-language rule and executes it. This
environment has zero egress, so the online query path is gated; the
execution half — turning a user-supplied source string into a GuidanceSpec —
works standalone and is what tests exercise.

SECURITY: `loss_from_source` executes arbitrary Python. Only feed it trusted
strings (same trust model as the reference, which exec'd LLM output
directly).
"""

from __future__ import annotations

from typing import Callable, Optional

from cld_tpu.guidance.perturbation import GuidanceSpec

LOSS_TEMPLATE_DOC = """
A generated loss must define:

    def guidance_loss(x, ctx, agt_mask=None):
        # x: [B, N, T, 6] descaled (x, y, vel, yaw, acc, yawvel)
        # ctx: cld_tpu.guidance.losses.GuidanceContext
        # returns [B, N]
"""


def loss_from_source(source: str, weight: float = 1.0) -> GuidanceSpec:
    """Compile a user/LLM-provided loss function source into a GuidanceSpec
    (`GPTLoss.__init__` exec path, `guidance_loss.py:1540-1573`)."""
    import jax
    import jax.numpy as jnp

    namespace = {"jnp": jnp, "jax": jax}
    exec(compile(source, "<guidance_codegen>", "exec"), namespace)
    fn = namespace.get("guidance_loss")
    if fn is None:
        raise ValueError("source must define guidance_loss(x, ctx, agt_mask=None)")
    return GuidanceSpec(fn, weight)


def query_llm_for_loss(
    rule_text: str, query_fn: Optional[Callable[[str], str]] = None, weight: float = 1.0
) -> GuidanceSpec:
    """Ask an LLM to synthesize a loss for a natural-language rule
    (`gpt_utils.py:40` query_gpt). `query_fn(prompt) -> source` must be
    supplied by the caller (no network access is assumed here)."""
    if query_fn is None:
        raise RuntimeError(
            "no LLM access in this environment; pass query_fn (prompt -> "
            "python source) or use loss_from_source with prepared code"
        )
    prompt = (
        "Write a JAX guidance loss for this traffic rule. "
        + LOSS_TEMPLATE_DOC
        + f"\nRule: {rule_text}\nReturn only Python source."
    )
    return loss_from_source(query_fn(prompt), weight)
