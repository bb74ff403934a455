"""Lattice planner tests: cost trade-offs + closed-loop integration."""

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.policies.planner import LatticePlannerConfig, lattice_planner_policy
from cld_tpu.sim.env import SimConfig, simulate
from cld_tpu.sim.scene import synthetic_scene_pack
from cld_tpu.sim.metrics import summarize_metrics


def test_planner_stays_on_road_and_progresses():
    batch = synthetic_batch(seed=0, batch_size=3, raster_size=64)
    policy = lattice_planner_policy()
    a = policy(batch, jax.random.key(0))
    assert a.controls.shape == (3, 52, 2)
    # selected plans end on the road and move forward
    assert (np.asarray(a.positions[:, -1, 0]) > 1.0).all()
    assert (np.abs(np.asarray(a.positions[:, -1, 1])) < 7.0).all()


def test_planner_avoids_blocking_agent():
    """A stopped car dead ahead: the planner should not pick the straight
    full-speed candidate."""
    batch = synthetic_batch(seed=1, batch_size=1, raster_size=64)
    other = np.zeros((1, 1, 52, 2), np.float32)
    other[..., 0] = 10.0  # parked 10 m ahead in our lane
    batch = batch._replace(
        all_other_agents_future_positions=jnp.asarray(other),
        all_other_agents_future_availability=jnp.ones((1, 1, 52)),
    )
    cfg = LatticePlannerConfig(w_collision=50.0)
    a = lattice_planner_policy(cfg)(batch, jax.random.key(0))
    final = np.asarray(a.positions[0, -1])
    # either stopped short of the obstacle or moved laterally around it
    assert final[0] < 9.0 or abs(final[1]) > 1.5


def test_planner_closed_loop():
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=3, sim_steps=20)
    cfg = SimConfig(num_simulation_steps=20, n_step_action=5, raster_size=64, hist_frames=4)
    policy = lattice_planner_policy(LatticePlannerConfig())
    state, traj = jax.jit(lambda r: simulate(pack, policy, r, cfg))(jax.random.key(0))
    m = summarize_metrics(pack, state, cfg)
    assert m["offroad_rate"] == 0.0
    dx = np.asarray(traj[-1, :, 0] - traj[0, :, 0])
    assert (dx[np.asarray(pack.controlled_mask)] > 0).all()
