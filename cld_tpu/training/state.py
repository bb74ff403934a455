"""Train state and optimizer construction.

Optimizer parity with the reference trainers
(`/root/reference/src/trainers/vae_trainer.py:27-49`,
`dm_trainer.py:44-68`): torch.optim.Adam with L2 weight_decay (coupled, i.e.
decay added to the gradient *before* the Adam moments — torch semantics, not
AdamW), stepped by a per-epoch warmup(10)+cosine LambdaLR.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainStateWithStats(train_state.TrainState):
    """flax TrainState + BatchNorm running statistics."""

    batch_stats: Any = None


def resolve_compute_dtype(precision: str = "auto") -> jnp.dtype:
    """Network compute dtype for training (parameters stay f32 — flax
    param_dtype — so this is true mixed precision like the reference's
    Lightning `precision='16-mixed'`, `utils/trainer_utils.py:123`; bf16
    needs no loss scaling). "auto" = bfloat16 on TPU, float32 elsewhere
    (CPU tests stay bit-deterministic)."""
    import jax

    if precision in ("auto", None):
        return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    table = {
        "bf16": jnp.bfloat16,
        "bf16-mixed": jnp.bfloat16,
        "bf16-true": jnp.bfloat16,
        # fp16 spellings map to bf16: same mixed-precision class, and bf16
        # is the native TPU half type (no loss scaling needed)
        "16": jnp.bfloat16,
        "16-mixed": jnp.bfloat16,
        "fp32": jnp.float32,
        "32": jnp.float32,
        "32-true": jnp.float32,
    }
    key = str(precision)
    if key not in table:
        raise ValueError(
            f"unknown train.training.precision {precision!r}; "
            f"accepted: 'auto', {sorted(table)}"
        )
    return table[key]


def warmup_cosine_by_epoch(
    base_lr: float, total_epochs: int, steps_per_epoch: int, warmup_epochs: float = 10
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Epoch-granular LambdaLR of the reference: linear 0->1 over
    warmup_epochs, then cosine to 0 over the remaining epochs. The factor
    changes only at epoch boundaries (Lightning steps the scheduler per
    epoch)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        warm = epoch / max(1, warmup_epochs)
        progress = (epoch - warmup_epochs) / max(1, total_epochs - warmup_epochs)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * progress))
        return base_lr * jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def make_optimizer(
    learning_rate: float | Callable,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """torch-Adam-with-weight_decay equivalent: g <- g + wd * p, then Adam."""
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def ema_update(ema_params, new_params, decay: float = 0.995):
    """Exponential moving average of a parameter pytree
    (`/root/reference/src/tbsim/models/diffuser_helpers.py:909-927` EMA;
    used by the legacy diffuser algos with periodic refresh)."""
    import jax

    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )


@struct.dataclass
class BetaSchedule:
    """KL weight annealing (`vae_trainer.py:20-24,75-82`): linear
    0.05 -> 0.3 over 9000 steps, clamped."""

    beta_start: float = 0.05
    beta_max: float = 0.3
    anneal_steps: int = 9000

    def __call__(self, step: jnp.ndarray) -> jnp.ndarray:
        inc = (self.beta_max - self.beta_start) / self.anneal_steps
        return jnp.minimum(self.beta_start + step * inc, self.beta_max)
