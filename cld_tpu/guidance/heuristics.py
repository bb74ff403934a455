"""Heuristic guidance construction from scene state.

Capability parity with `compute_heuristic_guidance`
(`/root/reference/src/tbsim/utils/scene_edit_utils.py:230-809`): the
reference builds guidance configs automatically from the current scene — a
target speed from history, a goal from the GT future, a stop region ahead of
an agent, or an adversarial collision pair. These builders produce
`GuidanceSpec` lists from a `ScenePack` + `SimState`, so rollout.py can do
`--editing-source heuristic` without hand-written configs.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from cld_tpu.guidance.losses import (
    AgentCollisionLoss,
    CollisionAttackLoss,
    GlobalTargetPosLoss,
    KeepDistanceLoss,
    MapCollisionLoss,
    SpeedLimitLoss,
    StopSignLoss,
    TargetSpeedLoss,
)
from cld_tpu.guidance.perturbation import GuidanceSpec


def heuristic_target_speed(pack, state, speed_scale: float = 1.0, weight: float = 1.0):
    """Hold each agent near its current speed x scale
    (`scene_edit_utils.py` heuristic_target_speed)."""
    target = np.asarray(state.states[:, 2]) * speed_scale
    return GuidanceSpec(TargetSpeedLoss(target_speed=target), weight)


def heuristic_agent_collision(weight: float = 10.0, num_disks: int = 5, buffer_dist: float = 0.2):
    return GuidanceSpec(AgentCollisionLoss(num_disks=num_disks, buffer_dist=buffer_dist), weight)


def heuristic_map_collision(weight: float = 10.0):
    return GuidanceSpec(MapCollisionLoss(), weight)


def heuristic_speed_limit(speed_limit: float = 15.0, weight: float = 1.0):
    return GuidanceSpec(SpeedLimitLoss(speed_limit=speed_limit), weight)


def heuristic_global_target_pos(pack, state, horizon_s: float = 10.0, weight: float = 1.0):
    """Goal = constant-velocity extrapolation of each agent
    (`heuristic_global_target_pos`: progress toward a forward goal)."""
    s = np.asarray(state.states)
    goal = s[:, :2] + horizon_s * s[:, 2:3] * np.stack(
        [np.cos(s[:, 3]), np.sin(s[:, 3])], axis=-1
    )
    return GuidanceSpec(GlobalTargetPosLoss(target_pos_world=goal, urgency=0.7), weight)


def heuristic_stop_sign(pack, state, ahead_m: float = 15.0, box_half=(5.0, 3.0), weight: float = 5.0):
    """Stop region a fixed distance ahead of each agent (agent frame)."""
    B = pack.num_agents
    center = np.tile([ahead_m, 0.0], (B, 1)).astype(np.float32)
    dim = np.tile(box_half, (B, 1)).astype(np.float32)
    return GuidanceSpec(StopSignLoss(stop_box_center=center, stop_box_dim=dim), weight)


def heuristic_collision_attack(attacker: int, victim: int, weight: float = 5.0,
                               time_lo: int = 20, time_hi: int = 52):
    """Adversarial pair: steer `attacker` into `victim`
    (`heuristic_gptcollision`)."""
    return GuidanceSpec(
        CollisionAttackLoss(attacker_ind=attacker, victim_ind=victim,
                            time_lo=time_lo, time_hi=time_hi),
        weight,
    )


def heuristic_keep_distance(target: int, ref: int, min_dist=5.0, max_dist=15.0, weight=2.0):
    return GuidanceSpec(
        KeepDistanceLoss(target_ind=target, ref_ind=ref, min_dist=min_dist, max_dist=max_dist),
        weight,
    )


HEURISTIC_MAP = {
    "target_speed": heuristic_target_speed,
    "agent_collision": lambda pack, state, **kw: heuristic_agent_collision(**kw),
    "map_collision": lambda pack, state, **kw: heuristic_map_collision(**kw),
    "speed_limit": lambda pack, state, **kw: heuristic_speed_limit(**kw),
    "global_target_pos": heuristic_global_target_pos,
    "stop_sign": heuristic_stop_sign,
}


def compute_heuristic_guidance(names: Sequence[str], pack, state) -> List[GuidanceSpec]:
    """Build specs for the requested heuristics
    (`compute_heuristic_guidance`, `scene_edit_utils.py:809-907`)."""
    return [HEURISTIC_MAP[n](pack, state) for n in names]
