"""Closed-loop evaluator (CLE) tests: validator semantics, reset-cumsum,
composites, aggregation — mirroring l5kit's `tests/cle/test_validators.py`
scenarios (duration modes with synthetic violation series)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.eval.cle import (
    ClosedLoopEvaluator,
    DrivenMilesCompositeMetric,
    EvaluationPlan,
    PassedDrivenMilesCompositeMetric,
    RangeValidator,
    ValidationCountingAggregator,
    cle_report,
    default_plan,
    reset_cumsum,
)
from cld_tpu.sim.env import SimConfig, simulate
from cld_tpu.sim.scene import synthetic_scene_pack


def test_reset_cumsum_matches_loop():
    rng = np.random.default_rng(0)
    x = rng.random(50)
    m = rng.random(50) > 0.4
    # reference semantics: the l5kit Python loop (validators.py:93-110)
    acc, out = 0.0, np.zeros(50)
    for i in range(50):
        acc = acc + x[i] if m[i] else 0.0
        out[i] = acc
    np.testing.assert_allclose(reset_cumsum(x, m), out, rtol=1e-12)


def test_range_validator_immediate():
    v = RangeValidator("v", "m", max_value=1.0)
    out = v.validate(np.array([0.5, 2.0, 0.1, 3.0]), dt=0.1)
    assert not out.is_valid_scene
    assert out.failed_frames == [1, 3]
    assert v.validate(np.array([0.5, 0.9]), dt=0.1).is_valid_scene


def test_range_validator_duration_total_vs_continuous():
    # violations: 3 frames, gap, 3 frames (dt=1 -> 6 s total, 3 s max run)
    series = np.array([9, 9, 9, 0, 9, 9, 9], float)
    total = RangeValidator("t", "m", max_value=1.0, violation_duration_s=5.0,
                           duration_mode="total")
    cont = RangeValidator("c", "m", max_value=1.0, violation_duration_s=5.0,
                          duration_mode="continuous")
    # total mode accumulates across the gap -> 6 s > 5 s fails
    assert not total.validate(series, dt=1.0).is_valid_scene
    # continuous mode resets at the gap -> max run 3 s passes
    assert cont.validate(series, dt=1.0).is_valid_scene
    # a 6-frame unbroken run fails in both modes
    run = np.array([9, 9, 9, 9, 9, 9], float)
    assert not cont.validate(run, dt=1.0).is_valid_scene


def test_range_validator_rejects_bad_config():
    with pytest.raises(ValueError):
        RangeValidator("v", "m")
    with pytest.raises(ValueError):
        RangeValidator("v", "m", min_value=2.0, max_value=1.0)
    with pytest.raises(ValueError):
        RangeValidator("v", "m", max_value=1.0, duration_mode="bogus")


def test_plan_checks_metric_references():
    with pytest.raises(ValueError):
        EvaluationPlan(
            metrics={"a": lambda *_: None},
            validators=(RangeValidator("v", "missing", max_value=1.0),),
        )


def test_cle_on_rollout_and_aggregation():
    """End-to-end: straight rollout passes collision/offroad validation;
    a hard-turn rollout fails offroad; driven miles accumulate."""
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=3,
                                sim_steps=20)
    cfg = SimConfig(num_simulation_steps=20, n_step_action=5, raster_size=64,
                    hist_frames=10)

    def policy(yawvel):
        def p(obs, rng):
            Na = obs.curr_speed.shape[0]
            return jnp.zeros((Na, 52, 2)).at[..., 1].set(yawvel)
        return p

    _, traj_straight = simulate(pack, policy(0.0), jax.random.key(0), cfg)
    rep = cle_report(pack, traj_straight, cfg)
    assert rep["failed_scenes"]["offroad"] == 0
    assert rep["composite"]["driven_miles"] > 0
    # passing scenes accumulate their full driven miles
    assert rep["composite"]["passed_driven_miles"] == pytest.approx(
        rep["composite"]["driven_miles"], rel=1e-6)

    _, traj_turn = simulate(pack, policy(1.0), jax.random.key(0), cfg)
    rep2 = cle_report(pack, traj_turn, cfg)
    assert rep2["failed_scenes"]["offroad"] > 0
    assert rep2["failed_frames"]["offroad"] > 0
    # miles stop counting at the first failed frame
    assert (rep2["composite"]["passed_driven_miles"]
            < rep2["composite"]["driven_miles"])

    # counting aggregator over raw validation results
    cle = ClosedLoopEvaluator(default_plan())
    res = cle.evaluate(pack, traj_turn, cfg)
    counts = ValidationCountingAggregator().aggregate(res["validation"])
    assert counts["offroad"] == rep2["failed_scenes"]["offroad"]
