"""Closed-loop metrics summaries.

Capability parity with the reference's `EnvMetrics` family
(`/root/reference/src/tbsim/envs/env_metrics.py`): `OffRoadRate` (:147),
`CollisionRate`/`DiskCollisionRate` (:391,489), `CriticalFailure` (:582),
`Comfort` (:1436). Per-step accumulation happens inside the simulation scan
(cld_tpu.sim.env); this module reduces the accumulators to episode metrics.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from cld_tpu.sim.env import SimConfig, SimState
from cld_tpu.sim.scene import ScenePack

# comfort bounds (env_metrics.py:1436 Comfort: max decel/accel/yaw-rate)
COMFORT_MAX_ABS_ACC = 3.0
COMFORT_MAX_ABS_YAWVEL = 0.7


def summarize_metrics(
    pack: ScenePack, state: SimState, cfg: SimConfig
) -> Dict[str, float]:
    """Reduce per-agent accumulators (controlled agents only) to episode
    rates."""
    mask = np.asarray(pack.controlled_mask)
    n_steps = float(state.step)
    offroad = np.asarray(state.offroad_steps)[mask]
    collision = np.asarray(state.collision_steps)[mask]
    acc = np.asarray(state.max_abs_acc)[mask]
    yawvel = np.asarray(state.max_abs_yawvel)[mask]

    ctype = np.asarray(state.collision_type_steps)[mask]  # [n, 3]

    # a replay-only episode (no controlled agents) or a 0-step episode must
    # report 0.0 rates, not NaN from empty means / 0-by-0 divisions
    def rate(x) -> float:
        return float(x.mean()) if x.size else 0.0

    denom = max(len(offroad), 1) * max(n_steps, 1.0)
    return {
        "offroad_rate": rate(offroad > 0),  # any offroad step -> failure
        "collision_rate": rate(collision > 0),
        # typed rates, mirroring CollisionRate's per-CollisionType dict
        # (`env_metrics.py:415-489`)
        "collision_rate_front": rate(ctype[:, 0] > 0),
        "collision_rate_rear": rate(ctype[:, 1] > 0),
        "collision_rate_side": rate(ctype[:, 2] > 0),
        "offroad_step_fraction": float(offroad.sum() / denom),
        "collision_step_fraction": float(collision.sum() / denom),
        "critical_failure_rate": rate((offroad > 0) | (collision > 0)),
        "comfort_violation_rate": rate(
            (acc > COMFORT_MAX_ABS_ACC) | (yawvel > COMFORT_MAX_ABS_YAWVEL)
        ),
        "num_controlled_agents": int(mask.sum()),
        "num_sim_steps": n_steps,
    }
