"""Batched open-loop metric kernels.

Capability parity with `/root/reference/src/tbsim/utils/metrics.py:24-650`:
oracle/mean ADE & FDE over sample sets, pairwise collision rate, off-road
detection (point / disk variants), trajectory diversity. Pure jnp, usable on
device inside eval scans or on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cld_tpu.ops.geometry import transform_points


def batch_average_displacement_error(
    gt: jnp.ndarray, pred: jnp.ndarray, avail: jnp.ndarray | None = None, mode: str = "mean"
) -> jnp.ndarray:
    """ADE over N samples (`metrics.py:201-240`): pred [B, N, T, 2],
    gt [B, T, 2] -> [B]. mode: 'mean' (average over samples) or 'oracle'
    (best sample)."""
    err = jnp.linalg.norm(pred - gt[:, None], axis=-1)  # [B, N, T]
    if avail is not None:
        denom = jnp.clip(avail.sum(-1), 1, None)[:, None]
        per_sample = (err * avail[:, None]).sum(-1) / denom
    else:
        per_sample = err.mean(-1)
    if mode == "oracle":
        return per_sample.min(-1)
    return per_sample.mean(-1)


def batch_final_displacement_error(
    gt: jnp.ndarray, pred: jnp.ndarray, mode: str = "mean"
) -> jnp.ndarray:
    """FDE over N samples (`metrics.py:242-287`)."""
    err = jnp.linalg.norm(pred[..., -1, :] - gt[:, None, -1, :], axis=-1)  # [B, N]
    return err.min(-1) if mode == "oracle" else err.mean(-1)


def batch_pairwise_collision_rate(
    pos: jnp.ndarray, extent: jnp.ndarray, scene_index: jnp.ndarray, thresh_scale: float = 1.0
) -> jnp.ndarray:
    """Fraction of agents whose trajectory comes within (sum of half-lengths)
    of another same-scene agent (`metrics.py:382-449`, disk approximation).

    pos [B, T, 2], extent [B, 3], scene_index [B] -> scalar rate.
    """
    B = pos.shape[0]
    dist = jnp.linalg.norm(pos[:, None] - pos[None], axis=-1)  # [B, B, T]
    rad = (extent[:, None, 0] + extent[None, :, 0]) / 2.0 * thresh_scale
    valid = (scene_index[:, None] == scene_index[None]) & ~jnp.eye(B, dtype=bool)
    hit = jnp.any((dist < rad[..., None]) & valid[..., None], axis=(1, 2))
    return hit.astype(jnp.float32).mean()


def batch_detect_off_road(
    pos: jnp.ndarray, drivable_map: jnp.ndarray, raster_from_agent: jnp.ndarray
) -> jnp.ndarray:
    """Per-point off-road flags (`metrics.py:451-478`): pos [B, ..., 2] ->
    {0., 1.} same leading shape."""
    pix = transform_points(pos, raster_from_agent)
    H, W = drivable_map.shape[-2:]
    col = jnp.clip(jnp.round(pix[..., 0]).astype(jnp.int32), 0, W - 1)
    row = jnp.clip(jnp.round(pix[..., 1]).astype(jnp.int32), 0, H - 1)
    b = jnp.arange(pos.shape[0]).reshape((-1,) + (1,) * (pos.ndim - 2))
    return (drivable_map[b, row, col] <= 0).astype(jnp.float32)


def batch_detect_off_road_disk(
    pos: jnp.ndarray, yaw: jnp.ndarray, extent: jnp.ndarray,
    drivable_map: jnp.ndarray, raster_from_agent: jnp.ndarray, num_disks: int = 3,
) -> jnp.ndarray:
    """Disk-sampled off-road detection (`metrics.py:521-548`): any of
    num_disks points along the vehicle length off the map -> off-road.
    pos/yaw [B, T, 2]/[B, T] -> [B, T] flags."""
    agt_rad = extent[:, 1] / 2.0
    lo = -(extent[:, 0] / 2.0) + agt_rad
    hi = (extent[:, 0] / 2.0) - agt_rad
    lin = jnp.linspace(0.0, 1.0, num_disks)
    cx = lo[:, None] + (hi - lo)[:, None] * lin[None]  # [B, D]
    c, s = jnp.cos(yaw), jnp.sin(yaw)  # [B, T]
    px = pos[..., 0][..., None] + cx[:, None, :] * c[..., None]
    py = pos[..., 1][..., None] + cx[:, None, :] * s[..., None]
    pts = jnp.stack([px, py], axis=-1)  # [B, T, D, 2]
    off = batch_detect_off_road(pts, drivable_map, raster_from_agent)
    return jnp.any(off > 0, axis=-1).astype(jnp.float32)


def batch_neg_multi_log_likelihood(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    confidences: jnp.ndarray,
    avails: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-modal NLL with the log-sum-exp trick
    (`metrics.py:66-110`, the l5kit competition loss): gt [B, T, 2],
    pred [B, M, T, 2], confidences [B, M], avails [B, T] -> [B]."""
    err = jnp.sum(((gt[:, None] - pred) * avails[:, None, :, None]) ** 2, axis=-1)
    log_conf = jnp.log(jnp.clip(confidences, 1e-12))
    e = log_conf - 0.5 * jnp.sum(err, axis=-1)  # [B, M]
    return -jax.nn.logsumexp(e, axis=-1)


def log_normal(x: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray,
               avails: jnp.ndarray | None = None) -> jnp.ndarray:
    """Elementwise diagonal-Gaussian log density summed over D
    (`metrics.py:505-525` log_normal): x [B, M, D], m/v [B|1, M, D] -> [B, M]."""
    lp = -0.5 * (jnp.log(2 * jnp.pi * v) + (x - m) ** 2 / v)
    if avails is not None:
        lp = lp * avails
    return jnp.sum(lp, axis=-1)


def gmm_loglikelihood(
    x: jnp.ndarray,
    m: jnp.ndarray,
    v: jnp.ndarray | None,
    pi: jnp.ndarray,
    avails: jnp.ndarray | None = None,
    mode: str = "mean",
) -> jnp.ndarray:
    """Log probability of x under a mixture of diagonal Gaussians
    (`metrics.py:549-582` GMM_loglikelihood): x [B, D], m/v [B|1, M, D],
    pi [B, M] -> [B]. mode aggregates the per-mode pi-weighted log probs
    exactly as the reference does (sum | mean | max over modes)."""
    if v is None:
        v = jnp.ones_like(m)
    xe = x[:, None]  # [B, 1, D]
    av = avails[:, None] if avails is not None else None
    log_prob = log_normal(xe, m, v, avails=av)  # [B, M]
    weighted = pi * log_prob
    if mode == "sum":
        return weighted.sum(1)
    if mode == "mean":
        return weighted.mean(1)
    if mode == "max":
        return weighted.max(1)
    raise ValueError(f"unknown mode {mode!r}")


def trajectory_diversity(pred: jnp.ndarray) -> jnp.ndarray:
    """Mean pairwise final-position spread across samples
    (`metrics.py` diversity): pred [B, N, T, 2] -> [B]."""
    fin = pred[..., -1, :]  # [B, N, 2]
    d = jnp.linalg.norm(fin[:, :, None] - fin[:, None], axis=-1)
    N = pred.shape[1]
    denom = max(N * (N - 1), 1)
    return d.sum((-1, -2)) / denom
