"""Closed-loop evaluator: validators + composite metrics + aggregation.

Capability-equivalent re-design of l5kit's CLE stack
(`/root/reference/src/l5kit/cle/closed_loop_evaluator.py:202`,
`validators.py:50-276`, `composite_metrics.py:40-137`): per-frame metric
series are reduced to pass/fail per validator with the same range +
violation-duration semantics (total and continuous duration modes), then
counted across scenes. The reference's `cumsum_with_reset` Python loop
(`validators.py:93-110`) becomes a vectorized reset-cumsum (cumsum minus a
running max of its value at reset points), so the whole validation runs as
array ops over [T, Na] series.

The l5kit "scene" (one ego per scene) maps to one controlled agent here;
per-frame series come straight from the on-device rollout log.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, NamedTuple, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from cld_tpu.sim.env import SimConfig
from cld_tpu.sim.scene import ScenePack


class ValidatorOutput(NamedTuple):
    """Per-scene validation result (`validators.py:13-18`)."""

    is_valid_scene: bool
    failed_frames: List[int]


def reset_cumsum(x: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Masked cumulative sum that resets at mask==False positions
    (`RangeValidator.cumsum_with_reset`, `validators.py:93-110`, vectorized):
    r_t = sum of x over the run of True mask ending at t.

    x [..., T], mask [..., T] bool -> [..., T].
    """
    s = np.cumsum(np.where(mask, x, 0.0), axis=-1)
    # value of s at the most recent reset (mask False) position <= t
    neg = np.where(mask, -np.inf, s)
    last_reset = np.maximum.accumulate(neg, axis=-1)
    r = np.where(np.isinf(last_reset), s, s - last_reset)
    return np.where(mask, r, 0.0)


@dataclasses.dataclass(frozen=True)
class RangeValidator:
    """min/max range check with optional violation-duration allowance
    (`validators.py:50-175`). duration_mode: "total" sums all violation
    durations per scene; "continuous" requires an unbroken violation run to
    exceed the allowance."""

    validator_name: str
    metric_name: str
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    violation_duration_s: float = 0.0
    duration_mode: str = "total"  # "total" | "continuous"

    def __post_init__(self):
        if self.min_value is None and self.max_value is None:
            raise ValueError("specify min_value and/or max_value")
        if (
            self.min_value is not None
            and self.max_value is not None
            and self.min_value >= self.max_value
        ):
            raise ValueError("min_value must be < max_value")
        if self.duration_mode not in ("total", "continuous"):
            raise ValueError(f"unknown duration_mode {self.duration_mode!r}")

    def validate(self, series: np.ndarray, dt: float) -> ValidatorOutput:
        """series [T] per-frame metric values for one scene/agent."""
        violated = np.zeros(series.shape, bool)
        if self.min_value is not None:
            violated |= series < self.min_value
        if self.max_value is not None:
            violated |= series > self.max_value

        if self.violation_duration_s <= 0.0:
            failed = np.nonzero(violated)[0]
            return ValidatorOutput(failed.size == 0, failed.tolist())

        ts_diff = np.full(series.shape, dt)
        if self.duration_mode == "total":
            cs = np.cumsum(ts_diff * violated) * violated
        else:
            cs = reset_cumsum(ts_diff, violated)
        failed = np.nonzero(cs > self.violation_duration_s)[0]
        return ValidatorOutput(failed.size == 0, failed.tolist())


# l5kit metrics.py:196-215 SimulatedDrivenMilesMetric conversion constant
METER_TO_MILES = 0.000621371


@dataclasses.dataclass(frozen=True)
class DrivenMilesCompositeMetric:
    """Total driven miles from per-frame displacements
    (`composite_metrics.py:106-135`); displacements are meters, the
    composite converts with l5kit's METER_TO_MILES."""

    composite_metric_name: str = "driven_miles"
    displacement_metric: str = "displacement"

    def compute(self, metric_results, validation_results) -> float:
        return float(
            np.sum(metric_results[self.displacement_metric]) * METER_TO_MILES
        )


@dataclasses.dataclass(frozen=True)
class PassedDrivenMilesCompositeMetric:
    """Driven miles accumulated only while validators pass
    (`composite_metrics.py:40-104`): frames at/after the first failed frame
    of any tracked validator stop counting."""

    composite_metric_name: str = "passed_driven_miles"
    validators: Sequence[str] = ()
    displacement_metric: str = "displacement"

    def compute(self, metric_results, validation_results) -> float:
        disp = metric_results[self.displacement_metric]
        ok = np.ones(disp.shape, bool)
        for name in self.validators:
            out = validation_results[name]
            if out.failed_frames:
                ok[min(out.failed_frames):] = False
        return float(np.sum(disp * ok) * METER_TO_MILES)


@dataclasses.dataclass(frozen=True)
class EvaluationPlan:
    """Metrics + validators + composite metrics (`closed_loop_evaluator.py:11-51`).
    metrics map a name to a per-frame series extractor
    (pack, traj, cfg) -> [T, Na]."""

    metrics: Dict[str, Callable]
    validators: Sequence[RangeValidator] = ()
    composite_metrics: Sequence[object] = ()

    def __post_init__(self):
        names = {m for m in self.metrics}
        for v in self.validators:
            if v.metric_name not in names:
                raise ValueError(
                    f"validator {v.validator_name!r} needs metric "
                    f"{v.metric_name!r} which is not in the plan"
                )


# ---------------------------------------------------------------------------
# per-frame series extractors over the rollout log traj [T, Na, 4]
# ---------------------------------------------------------------------------
def displacement_series(pack: ScenePack, traj: jnp.ndarray, cfg: SimConfig):
    """Per-frame driven distance (meters)."""
    pos = traj[..., :2]
    start = pack.init_states[None, :, :2]
    prev = jnp.concatenate([start, pos[:-1]], axis=0)
    return jnp.linalg.norm(pos - prev, axis=-1)


def offroad_series(pack: ScenePack, traj: jnp.ndarray, cfg: SimConfig):
    """1.0 where the agent center is off the drivable map (vectorized over
    the whole [T, Na] log in one gather — the sim scan's lookup convention,
    sim/env.py:drivable_at_world)."""
    from cld_tpu.sim.env import drivable_at_world

    return (drivable_at_world(pack, traj[..., :2]) <= 0).astype(jnp.float32)


def collision_series(pack: ScenePack, traj: jnp.ndarray, cfg: SimConfig):
    """1.0 on frames where the agent's oriented box overlaps another's
    (exact SAT test, same geometry as the sim scan —
    ops/geometry.py:obb_collision_matrix)."""
    from cld_tpu.ops.geometry import obb_collision_matrix

    pos = traj[..., :2]  # [T, Na, 2]
    Na = pack.num_agents
    same_scene = pack.scene_index[:, None] == pack.scene_index[None, :]
    valid_pair = same_scene & ~jnp.eye(Na, dtype=bool)
    hit = obb_collision_matrix(
        pos, traj[..., 3], pack.extent[:, :2], extent_scale=cfg.collision_thresh
    ) & valid_pair[None]
    return jnp.any(hit, axis=-1).astype(jnp.float32)


def speed_series(pack: ScenePack, traj: jnp.ndarray, cfg: SimConfig):
    return traj[..., 2]


def default_plan(
    max_speed: float = 35.0, offroad_duration_s: float = 0.0
) -> EvaluationPlan:
    """The standard validation set, mirroring l5kit's CLEEvaluationPlan
    composition (collision/offroad/displacement validators + driven miles)."""
    return EvaluationPlan(
        metrics={
            "displacement": displacement_series,
            "offroad": offroad_series,
            "collision": collision_series,
            "speed": speed_series,
        },
        validators=(
            RangeValidator("collision", "collision", max_value=0.5),
            RangeValidator(
                "offroad", "offroad", max_value=0.5,
                violation_duration_s=offroad_duration_s,
                duration_mode="continuous",
            ),
            RangeValidator("speed", "speed", max_value=max_speed),
        ),
        composite_metrics=(
            DrivenMilesCompositeMetric(),
            PassedDrivenMilesCompositeMetric(
                validators=("collision", "offroad")
            ),
        ),
    )


class ClosedLoopEvaluator:
    """Runs an EvaluationPlan over a rollout log
    (`closed_loop_evaluator.py:202-277`): metric series on device, then
    per-agent validation + composite metrics + counting aggregation."""

    def __init__(self, plan: EvaluationPlan):
        self.plan = plan

    def evaluate(
        self, pack: ScenePack, traj: jnp.ndarray, cfg: SimConfig
    ) -> Dict[str, Dict]:
        series = {
            name: np.asarray(fn(pack, traj, cfg))
            for name, fn in self.plan.metrics.items()
        }  # each [T, Na]
        controlled = np.asarray(pack.controlled_mask)
        agents = np.nonzero(controlled)[0]
        validation: Dict[int, Dict[str, ValidatorOutput]] = {}
        composites: Dict[int, Dict[str, float]] = {}
        for a in agents:
            per_metric = {k: v[:, a] for k, v in series.items()}
            vouts = {
                v.validator_name: v.validate(per_metric[v.metric_name], cfg.dt)
                for v in self.plan.validators
            }
            validation[int(a)] = vouts
            composites[int(a)] = {
                cm.composite_metric_name: cm.compute(per_metric, vouts)
                for cm in self.plan.composite_metrics
            }
        return {"validation": validation, "composite": composites}


class ValidationCountingAggregator:
    """Count failed scenes (agents) per validator
    (`validators.py:197-240`); with failed_frames=True, count failing
    frames instead."""

    def __init__(self, failed_frames: bool = False):
        self.failed_frames = failed_frames

    def aggregate(self, validation: Dict[int, Dict[str, ValidatorOutput]]):
        agg: Dict[str, int] = {}
        for outs in validation.values():
            for name, out in outs.items():
                if self.failed_frames:
                    agg[name] = agg.get(name, 0) + len(out.failed_frames)
                else:
                    agg[name] = agg.get(name, 0) + int(not out.is_valid_scene)
        return agg


def cle_report(
    pack: ScenePack,
    traj: jnp.ndarray,
    cfg: SimConfig,
    plan: Optional[EvaluationPlan] = None,
) -> Dict[str, object]:
    """One-call CLE summary for the rollout CLI: failed-scene counts per
    validator + aggregate composite metrics."""
    plan = plan or default_plan()
    cle = ClosedLoopEvaluator(plan)
    res = cle.evaluate(pack, traj, cfg)
    counts = ValidationCountingAggregator().aggregate(res["validation"])
    frame_counts = ValidationCountingAggregator(failed_frames=True).aggregate(
        res["validation"]
    )
    comp_total: Dict[str, float] = {}
    for per_agent in res["composite"].values():
        for k, v in per_agent.items():
            comp_total[k] = comp_total.get(k, 0.0) + v
    return {
        "num_scenes": len(res["validation"]),
        "failed_scenes": counts,
        "failed_frames": frame_counts,
        "composite": comp_total,
    }
