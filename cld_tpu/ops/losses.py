"""Loss kernels — the legacy training-loss library.

Capability parity with `/root/reference/src/tbsim/utils/loss_utils.py`
(cosine/KLD family, Gaussian-mixture likelihoods, trajectory/goal losses,
edge-based collision losses, GAN discriminator loss). Pure jnp; consumed by
the zoo trainers (cld_tpu.training.zoo) and usable standalone.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def cosine_loss(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """1 - cos(pred, label), meaned (`loss_utils.py:21-32`)."""
    num = jnp.sum(preds * labels, axis=-1)
    den = jnp.linalg.norm(preds, axis=-1) * jnp.linalg.norm(labels, axis=-1)
    return jnp.mean(1.0 - num / jnp.clip(den, 1e-8))


def kld_0_1_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0, I)) averaged over the batch (`loss_utils.py:34-46`)."""
    kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    return jnp.mean(kld)


def kld_gaussian_loss(mu_1, logvar_1, mu_2, logvar_2) -> jnp.ndarray:
    """KL(N1 || N2) for diagonal Gaussians (`loss_utils.py:48-65`)."""
    kld = 0.5 * jnp.sum(
        logvar_2 - logvar_1
        + (jnp.exp(logvar_1) + (mu_1 - mu_2) ** 2) / jnp.exp(logvar_2)
        - 1.0,
        axis=-1,
    )
    return jnp.mean(kld)


def kld_discrete(logp: jnp.ndarray, logq: jnp.ndarray) -> jnp.ndarray:
    """KL between categorical distributions given log probs
    (`loss_utils.py:67-76`)."""
    return jnp.mean(jnp.sum(jnp.exp(logp) * (logp - logq), axis=-1))


def log_normal(x, m, v, avails: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Diagonal-Gaussian log prob summed over the last dim
    (`loss_utils.py:78-98`; avails mask the residual, not the log-var term,
    exactly as the reference does)."""
    resid = (x - m) * avails if avails is not None else (x - m)
    element = -0.5 * (jnp.log(v) + resid**2 / v + jnp.log(2 * jnp.pi))
    return jnp.sum(element, axis=-1)


def log_normal_mixture(x, m, v, w=None, log_w=None) -> jnp.ndarray:
    """Mixture-of-Gaussians log prob (`loss_utils.py:100-134`): uniform
    weights use log-mean-exp, explicit weights use log-sum-exp."""
    lp = log_normal(x[:, None], m, v)  # [B, M]
    if w is not None or log_w is not None:
        if w is not None:
            log_w = jnp.log(w)
        return jax.nn.logsumexp(lp + log_w, axis=1)
    return jax.nn.logsumexp(lp, axis=1) - jnp.log(lp.shape[1])


def nll_gmm_loss(x, m, v, pi, avails=None, detach: bool = True, mode: str = "sum") -> jnp.ndarray:
    """GMM NLL with the best-mode gradient trick (`loss_utils.py:136-174`):
    in detach mode only the max-likelihood mode receives gradients, the
    others contribute through stop_gradient."""
    if v is None:
        v = jnp.ones_like(m)
    av = avails[:, None] if avails is not None else None
    lp = log_normal(x[:, None], m, v, avails=av)  # [B, M]
    max_flag = lp == lp.max(axis=1, keepdims=True)
    if mode == "sum":
        if detach:
            lp_det = jax.lax.stop_gradient(lp)
            return (
                jnp.sum(-pi * lp * max_flag, axis=1).mean()
                + jnp.sum(-pi * lp_det * (~max_flag), axis=1).mean()
            )
        return jnp.sum(-pi * lp, axis=1).mean()
    if mode == "max":
        return jnp.sum(-pi * lp * max_flag, axis=1).mean()
    raise ValueError(f"unknown mode {mode!r}")


def trajectory_loss(
    predictions: jnp.ndarray,  # [B, T, D]
    targets: jnp.ndarray,
    availabilities: jnp.ndarray,  # [B, T]
    weights_scaling: Optional[jnp.ndarray] = None,  # [D]
) -> jnp.ndarray:
    """Availability-masked MSE (`loss_utils.py:260-280`)."""
    err = (predictions - targets) ** 2
    if weights_scaling is not None:
        err = err * weights_scaling
    return jnp.mean(err * availabilities[..., None])


def multimodal_trajectory_loss(
    predictions: jnp.ndarray,  # [B, M, T, D]
    targets: jnp.ndarray,  # [B, T, D]
    availabilities: jnp.ndarray,  # [B, T]
    prob: jnp.ndarray,  # [B, M]
    weights_scaling: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Prob-weighted min-over-modes trajectory loss (`loss_utils.py:282-326`):
    the best mode's error carries the regression gradient; non-best modes
    contribute their DETACHED error (so prob learns to down-weight bad
    modes without dragging their trajectories); everything prob-weighted
    and normalized by the available-step count, exactly as the reference."""
    err = (predictions - targets[:, None]) ** 2
    if weights_scaling is not None:
        err = err * weights_scaling
    err = err * availabilities[:, None, :, None]  # [B, M, T, D]
    per_mode = jnp.sum(err, axis=(2, 3))  # [B, M]
    min_flag = per_mode == jnp.min(per_mode, axis=1, keepdims=True)  # [B, M]
    w = prob * min_flag
    w_non = prob * ~min_flag
    loss = (
        jnp.sum(err * w[:, :, None, None])
        + jnp.sum(jax.lax.stop_gradient(err) * w_non[:, :, None, None])
    ) / jnp.clip(jnp.sum(availabilities), 1.0)
    return loss


def goal_reaching_loss(
    predictions: jnp.ndarray,  # [B, T, D]
    targets: jnp.ndarray,
    availabilities: jnp.ndarray,  # [B, T]
    weights_scaling: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MSE at each trajectory's LAST available step
    (`loss_utils.py:328-357`): a one-hot goal mask at the final valid frame
    fed through trajectory_loss, so the normalization (mean over B*T*D)
    matches the reference exactly — gathering and averaging over B*D alone
    would make this term T times larger than reference-tuned weights
    expect."""
    T = availabilities.shape[1]
    idx = T - 1 - jnp.argmax(availabilities[:, ::-1] > 0, axis=1)  # last valid
    has_any = jnp.any(availabilities > 0, axis=1)
    goal_mask = (
        jax.nn.one_hot(idx, T, dtype=predictions.dtype) * has_any[:, None]
    )  # [B, T]
    return trajectory_loss(predictions, targets, goal_mask, weights_scaling)


def collision_loss(
    ego_pos: jnp.ndarray,  # [B, T, 2]
    other_pos: jnp.ndarray,  # [B, S, T, 2]
    ego_extent: jnp.ndarray,  # [B, 2]
    other_extent: jnp.ndarray,  # [B, S, 2]
    other_avail: jnp.ndarray,  # [B, S, T]
) -> jnp.ndarray:
    """Soft edge-collision penalty (`loss_utils.py:510-571` via the
    sigmoid(-distance) form of `gen_ego_edges` + `VEH_VEH_collision`,
    disk approximation)."""
    d = jnp.linalg.norm(ego_pos[:, None] - other_pos, axis=-1)  # [B, S, T]
    rad = (ego_extent[:, None, 0] + other_extent[..., 0]) / 2.0
    per = jax.nn.sigmoid(-(d - rad[..., None]) * 4.0) * other_avail
    return jnp.mean(jnp.max(per, axis=(1, 2)))


def likelihood_loss(likelihood: jnp.ndarray) -> jnp.ndarray:
    """1 - mean(likelihood) (`loss_utils.py:440-441`) — the reference's
    bounded linear form, NOT a log-likelihood (log gradients explode as
    likelihood -> 0)."""
    return 1.0 - jnp.mean(likelihood)


def discriminator_loss(likelihood_pred: jnp.ndarray, likelihood_gt: jnp.ndarray) -> jnp.ndarray:
    """GAN discriminator BCE in likelihood space (`loss_utils.py:573-575`)."""
    return -jnp.mean(jnp.log(1.0 - likelihood_pred + 1e-8)) - jnp.mean(
        jnp.log(likelihood_gt + 1e-8)
    )


def compute_pred_loss(
    recon_loss_type: str,
    pred: jnp.ndarray,  # [B, M, T, D] (or [B, T, D] for unimodal)
    target_traj: jnp.ndarray,  # [B, T, D]
    avails: jnp.ndarray,  # [B, T]
    prob: Optional[jnp.ndarray] = None,  # [B, M]
    weights_scaling: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatch on reconstruction-loss type (`loss_utils.py:577-620`)."""
    if pred.ndim == 3:
        return trajectory_loss(pred, target_traj, avails, weights_scaling)
    if recon_loss_type == "MSE":
        if prob is None:
            prob = jnp.full(pred.shape[:2], 1.0 / pred.shape[1])
        return multimodal_trajectory_loss(pred, target_traj, avails, prob, weights_scaling)
    if recon_loss_type == "NLL":
        B, M = pred.shape[:2]
        x = (target_traj * avails[..., None]).reshape(B, -1)
        m = (pred * avails[:, None, :, None]).reshape(B, M, -1)
        if prob is None:
            prob = jnp.full((B, M), 1.0 / M)
        return nll_gmm_loss(x, m, None, prob)
    raise ValueError(f"unknown recon loss {recon_loss_type!r}")
