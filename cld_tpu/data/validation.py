"""Batch self-consistency checks.

Capability parity with the reference's consistency assertions
(`/root/reference/src/tbsim/utils/trajdata_utils.py:352-356,1432-1493`
check_consistency/check_action_consistency and the state-tensor equality
checks in batch parsing): validate that a TrafficBatch is internally
coherent before it reaches training — standardized frames, finite values,
mask/shape agreement, GT future integrability.

Used by the converter after packing and available as a loader debug hook.
"""

from __future__ import annotations

from typing import List

import numpy as np

from cld_tpu.data.batch import TrafficBatch
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics
from cld_tpu.models.vae import get_state_and_action_from_batch


def check_batch_consistency(
    batch: TrafficBatch, dyn: UnicycleParams | None = None, atol_pos: float = 0.5
) -> List[str]:
    """Returns a list of violation strings (empty = consistent)."""
    problems: List[str] = []
    b = {k: np.asarray(v) for k, v in batch._asdict().items() if v is not None}

    for name, arr in b.items():
        if not np.isfinite(arr).all():
            problems.append(f"{name}: non-finite values")

    B = b["image"].shape[0]
    for name in ("drivable_map", "raster_from_agent", "curr_speed", "target_positions"):
        if b[name].shape[0] != B:
            problems.append(f"{name}: batch dim {b[name].shape[0]} != {B}")

    # standardized agent frame: current pose at origin
    if np.abs(b["history_positions"][:, -1]).max() > 1e-3:
        problems.append("history_positions[-1] not at origin (unstandardized frame?)")
    if np.abs(b["history_yaws"][:, -1]).max() > 1e-3:
        problems.append("history_yaws[-1] not zero (unstandardized frame?)")

    # availability masks are {0, 1}
    for name in ("target_availabilities", "history_availabilities"):
        vals = np.unique(b[name])
        if not np.isin(vals, [0.0, 1.0]).all():
            problems.append(f"{name}: non-binary availability values")

    # GT future must be re-integrable through the dynamics (the action
    # consistency check): inverse dynamics -> forward rollout -> positions
    if dyn is None:
        dyn = UnicycleParams(max_steer=0.5, max_yawvel=6.283185307179586,
                             acce_lo=-10.0, acce_hi=8.0)
    sa = get_state_and_action_from_batch(batch, batch.target_positions.shape[1])
    import jax.numpy as jnp

    curr = jnp.concatenate(
        [batch.history_positions[:, -1], batch.curr_speed[:, None],
         batch.history_yaws[:, -1]], axis=-1,
    )
    re = unicycle_forward_dynamics(dyn, curr, sa[..., 4:6], 0.1)
    err = np.abs(np.asarray(re[..., :2]) - b["target_positions"])
    avail = b["target_availabilities"][..., None] > 0
    max_err = (err * avail).max() if avail.any() else 0.0
    if max_err > atol_pos:
        problems.append(
            f"GT future not dynamics-consistent: max position error {max_err:.3f} m"
        )
    return problems
