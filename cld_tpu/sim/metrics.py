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

    offroad_rate = float((offroad > 0).mean())  # any offroad step -> failure
    collision_rate = float((collision > 0).mean())
    return {
        "offroad_rate": offroad_rate,
        "collision_rate": collision_rate,
        # typed rates, mirroring CollisionRate's per-CollisionType dict
        # (`env_metrics.py:415-489`)
        "collision_rate_front": float((ctype[:, 0] > 0).mean()),
        "collision_rate_rear": float((ctype[:, 1] > 0).mean()),
        "collision_rate_side": float((ctype[:, 2] > 0).mean()),
        "offroad_step_fraction": float(offroad.sum() / (len(offroad) * n_steps)),
        "collision_step_fraction": float(collision.sum() / (len(collision) * n_steps)),
        "critical_failure_rate": float(((offroad > 0) | (collision > 0)).mean()),
        "comfort_violation_rate": float(
            ((acc > COMFORT_MAX_ABS_ACC) | (yawvel > COMFORT_MAX_ABS_YAWVEL)).mean()
        ),
        "num_controlled_agents": int(mask.sum()),
        "num_sim_steps": n_steps,
    }
