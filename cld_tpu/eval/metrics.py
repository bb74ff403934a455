"""Open-loop evaluation metrics.

Capability parity with the reference's metric kernels: ADE/FDE
(`/root/reference/src/tbsim/utils/metrics.py:201-287`), Wasserstein "realism
deviation" over longitudinal/lateral acceleration and jerk
(`src/trainers/guide_dm_trainer.py:253-295`). The Wasserstein-1 distance is
implemented directly (quantile-function integral) instead of importing
scipy, so it can run on device when needed.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def ade(pred: np.ndarray, gt: np.ndarray, avail: np.ndarray | None = None) -> float:
    """Average displacement error over [B, T, 2] trajectories."""
    err = np.linalg.norm(pred - gt, axis=-1)
    if avail is not None:
        return float((err * avail).sum() / np.clip(avail.sum(), 1, None))
    return float(err.mean())


def fde(pred: np.ndarray, gt: np.ndarray, avail: np.ndarray | None = None) -> float:
    """Final displacement error at the LAST AVAILABLE frame per sample
    (`metrics.py:242-287` gathers by availability — hard-indexing -1 would
    measure distance to zero padding on short GT futures)."""
    err = np.linalg.norm(pred - gt, axis=-1)  # [..., T]
    if avail is None:
        return float(err[..., -1].mean())
    avail = np.asarray(avail) > 0
    T = err.shape[-1]
    last = T - 1 - np.argmax(avail[..., ::-1], axis=-1)  # [...]
    has_any = avail.any(axis=-1)
    final = np.take_along_axis(err, last[..., None], axis=-1)[..., 0]
    return float((final * has_any).sum() / np.clip(has_any.sum(), 1, None))


def wasserstein_1d(a: np.ndarray, b: np.ndarray) -> float:
    """W1 distance between empirical distributions (scipy-equivalent)."""
    a = np.sort(np.asarray(a, dtype=np.float64).ravel())
    b = np.sort(np.asarray(b, dtype=np.float64).ravel())
    all_vals = np.sort(np.concatenate([a, b]))
    deltas = np.diff(all_vals)
    # empirical CDFs evaluated between consecutive support points
    cdf_a = np.searchsorted(a, all_vals[:-1], side="right") / len(a)
    cdf_b = np.searchsorted(b, all_vals[:-1], side="right") / len(b)
    return float(np.sum(np.abs(cdf_a - cdf_b) * deltas))


def realism_deviation(stats: Dict[str, np.ndarray], dt: float = 0.1) -> Dict[str, float]:
    """Aggregate Wasserstein realism metrics from accumulated per-batch
    statistics (keys long_acc_gt/pred, lat_acc_gt/pred as flat arrays)
    (`guide_dm_trainer.py:253-295`)."""
    long_gt = np.asarray(stats["long_acc_gt"])
    long_pred = np.asarray(stats["long_acc_pred"])
    if "jerk_gt" in stats:  # device-computed per-agent jerk (ppo._test_step)
        jerk_gt = np.asarray(stats["jerk_gt"])
        jerk_pred = np.asarray(stats["jerk_pred"])
    elif long_gt.ndim >= 2:
        # per-agent rows: finite-difference along the trailing time axis
        jerk_gt = np.diff(long_gt, axis=-1) / dt
        jerk_pred = np.diff(long_pred, axis=-1) / dt
    else:
        raise ValueError(
            "realism_deviation needs per-agent jerk: pass jerk_gt/jerk_pred "
            "(ppo._test_step computes them on device) or 2-D per-agent "
            "acceleration rows — differencing FLAT concatenated arrays "
            "would inject fake jerk samples at agent/batch seams"
        )
    wd_long = wasserstein_1d(long_gt, long_pred)
    wd_lat = wasserstein_1d(stats["lat_acc_gt"], stats["lat_acc_pred"])
    wd_jerk = wasserstein_1d(jerk_gt, jerk_pred)
    return {
        "wd_long": wd_long,
        "wd_lat": wd_lat,
        "wd_jerk": wd_jerk,
        "realism_deviation": (wd_long + wd_lat + wd_jerk) / 3.0,
    }
