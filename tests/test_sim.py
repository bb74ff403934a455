"""Closed-loop simulator tests: rendering, kinematics, metrics, mock policies.

Mirrors the reference's MockModel pattern
(`src/l5kit/tests/simulation/unroll_test.py:14-28`): constant-action
policies drive the closed-loop scan so the environment can be tested exactly
without a trained model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.ops.raster import rasterize_history, warp_to_agent_frame
from cld_tpu.ops.geometry import raster_from_agent_matrix, world_from_agent_matrix
from cld_tpu.sim.env import SimConfig, init_sim_state, render_observation, simulate
from cld_tpu.sim.metrics import summarize_metrics
from cld_tpu.sim.scene import synthetic_scene_pack

CFG = SimConfig(num_simulation_steps=20, n_step_action=5, raster_size=64, hist_frames=10)


@pytest.fixture(scope="module")
def pack():
    return synthetic_scene_pack(seed=0, num_scenes=2, agents_per_scene=3, sim_steps=20)


def constant_policy(acc=0.0, yawvel=0.0, T=52):
    def policy(obs, rng):
        Na = obs.curr_speed.shape[0]
        u = jnp.zeros((Na, T, 2))
        return u.at[..., 0].set(acc).at[..., 1].set(yawvel)

    return policy


def test_warp_identity():
    """Agent at world origin with yaw 0: egocentric warp reproduces the
    world map around it."""
    world_map = jnp.zeros((100, 100, 1)).at[:, :, 0].set(
        jnp.arange(100)[:, None] / 100.0
    )
    wfa = world_from_agent_matrix(jnp.zeros((1, 2)), jnp.zeros((1,)))
    out = warp_to_agent_frame(
        world_map, wfa, 0.5, jnp.array([-25.0, -25.0]), raster_size=64,
        pixel_size=0.5, ego_center=(-0.5, 0.0),
    )
    assert out.shape == (1, 64, 64, 1)
    # ego pixel = ((1+e)/2)*size = (col 16, row 32) ~ world origin -> 0.5
    np.testing.assert_allclose(float(out[0, 32, 16, 0]), 0.5, atol=0.05)


def test_warp_aligns_with_raster_from_agent():
    """Regression: the warped map and raster_from_agent must share the
    ego-center convention — a world marker under the agent appears exactly
    at the raster_from_agent pixel of the agent origin."""
    world_map = jnp.zeros((128, 128, 1))
    origin = jnp.array([-32.0, -32.0])
    res = 0.5
    agent_pos = jnp.array([[7.0, -3.0]])
    agent_yaw = jnp.array([0.4])
    # marker at the agent's world position
    mi = ((agent_pos[0] - origin) / res).astype(int)
    world_map = world_map.at[int(mi[1]), int(mi[0]), 0].set(1.0)
    wfa = world_from_agent_matrix(agent_pos, agent_yaw)
    out = warp_to_agent_frame(world_map, wfa, res, origin, raster_size=64,
                              pixel_size=0.5, ego_center=(-0.5, 0.0))
    rfa = raster_from_agent_matrix(64, 0.5, (-0.5, 0.0))
    px, py = int(rfa[0, 2]), int(rfa[1, 2])
    # marker is within one pixel of the expected ego pixel
    patch = np.asarray(out[0, py - 1 : py + 2, px - 1 : px + 2, 0])
    assert patch.max() == 1.0


def test_warp_scene_maps_pallas_matches_jnp():
    """The banded one-hot MXU warp (interpret mode) == the exact jnp warp
    up to 8-bit quantization (identical index math, quantized values)."""
    from cld_tpu.ops.raster import warp_scene_maps

    rng = np.random.default_rng(3)
    Ns, Hw, C, Na = 2, 256, 3, 5
    # quantization-exact values (multiples of 1/255)
    world = jnp.asarray(
        rng.integers(0, 256, (Ns, Hw, Hw, C)).astype(np.float32) / 255.0
    )
    origin = jnp.asarray(np.full((Ns, 2), -Hw * 0.5 / 2, np.float32))
    scene = jnp.asarray(rng.integers(0, Ns, Na).astype(np.int32))
    pos = jnp.asarray(rng.uniform(-25, 25, (Na, 2)), jnp.float32)
    yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, Na), jnp.float32)
    wfa = world_from_agent_matrix(pos, yaw)
    kw = dict(raster_size=64, pixel_size=0.5, ego_center=(-0.5, 0.0))
    ref = warp_scene_maps(world, origin, 0.5, wfa, scene, impl="jnp", **kw)
    got = warp_scene_maps(world, origin, 0.5, wfa, scene, impl="pallas", **kw)
    assert got.shape == (Na, 64, 64, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_rasterize_history_marks():
    B, S, Th, R = 1, 2, 4, 64
    rfa = jnp.asarray(raster_from_agent_matrix(R, 0.5, (-0.5, 0.0)))[None]
    ego = jnp.zeros((B, Th, 2))  # at origin
    ego_avail = jnp.ones((B, Th))
    neigh = jnp.tile(jnp.array([[5.0, 0.0]]), (B, S, Th, 1))
    neigh_avail = jnp.ones((B, S, Th))
    img = rasterize_history(ego, ego_avail, neigh, neigh_avail, rfa, R)
    assert img.shape == (B, Th, R, R)
    # ego at pixel (32, 64... ) value +1; neighbor at +5m -> +10px -> -1
    ego_px = (int(rfa[0, 1, 2]), int(rfa[0, 0, 2]))
    assert float(img[0, 0, ego_px[0], ego_px[1]]) == 1.0
    assert float(img[0, 0, ego_px[0], ego_px[1] + 10]) == -1.0
    # unavailable neighbors leave no mark
    img2 = rasterize_history(ego, ego_avail, neigh, jnp.zeros((B, S, Th)), rfa, R)
    assert float(jnp.sum(img2 == -1.0)) == 0


def test_render_observation_shapes(pack):
    state = init_sim_state(pack, CFG)
    obs = render_observation(pack, state, CFG)
    Na = pack.num_agents
    Th = CFG.hist_frames + 1
    assert obs.image.shape == (Na, 64, 64, Th + 3)
    assert obs.drivable_map.shape == (Na, 64, 64)
    # agents start on the road: drivable under ego pixel
    ego_px = (int(obs.raster_from_agent[0, 1, 2]), int(obs.raster_from_agent[0, 0, 2]))
    vals = np.asarray(obs.drivable_map[:, ego_px[0], ego_px[1]])
    assert (vals > 0).all()
    np.testing.assert_allclose(np.asarray(obs.curr_speed), np.asarray(pack.init_states[:, 2]))
    # history is egocentric: last position at origin
    np.testing.assert_allclose(np.asarray(obs.history_positions[:, -1]), 0.0, atol=1e-4)


def test_simulate_straight_stays_on_road(pack):
    state, traj = jax.jit(
        lambda rng: simulate(pack, constant_policy(0.0, 0.0), rng, CFG)
    )(jax.random.key(0))
    assert traj.shape == (20, pack.num_agents, 4)
    m = summarize_metrics(pack, state, CFG)
    assert m["offroad_rate"] == 0.0
    assert m["num_sim_steps"] == 20
    # agents actually moved forward
    dx = np.asarray(traj[-1, :, 0] - traj[0, :, 0])
    assert (dx > 0).all()


def test_simulate_hard_turn_goes_offroad(pack):
    cfg = SimConfig(num_simulation_steps=40, n_step_action=5, raster_size=64, hist_frames=10)
    state, _ = simulate(pack, constant_policy(0.0, 1.0), jax.random.key(0), cfg)
    m = summarize_metrics(pack, state, cfg)
    assert m["offroad_rate"] > 0.0
    assert m["comfort_violation_rate"] > 0.0  # yawvel 0.6 is near/over bound


def test_replay_agents_ignore_policy(pack):
    """Replay (non-controlled) agents follow replay_actions regardless of
    the policy output."""
    state_a, traj_a = simulate(pack, constant_policy(5.0, 0.0), jax.random.key(0), CFG)
    state_b, traj_b = simulate(pack, constant_policy(-5.0, 0.0), jax.random.key(0), CFG)
    replay = ~np.asarray(pack.controlled_mask)
    np.testing.assert_allclose(
        np.asarray(traj_a[:, replay]), np.asarray(traj_b[:, replay]), atol=1e-5
    )
    controlled = np.asarray(pack.controlled_mask)
    assert np.abs(np.asarray(traj_a[-1, controlled, 2]) - np.asarray(traj_b[-1, controlled, 2])).max() > 1.0


def test_collision_metric_detects_crash():
    """Two controlled agents in the same lane, rear one much faster."""
    pack = synthetic_scene_pack(seed=1, num_scenes=1, agents_per_scene=2, sim_steps=40)
    init = np.array(pack.init_states)
    init[0] = [0.0, 0.0, 12.0, 0.0]
    init[1] = [8.0, 0.0, 0.0, 0.0]
    pack = pack._replace(
        init_states=jnp.asarray(init),
        controlled_mask=jnp.ones(2, bool),
    )
    cfg = SimConfig(num_simulation_steps=40, n_step_action=5, raster_size=64, hist_frames=10)
    state, traj = simulate(pack, constant_policy(0.0, 0.0), jax.random.key(0), cfg)
    m = summarize_metrics(pack, state, cfg)
    assert m["collision_rate"] > 0.0


def test_collision_types_front_rear():
    """Rear-ending: the striking agent records FRONT collisions, the struck
    agent REAR — the reference's CollisionType classification
    (`geometry_utils.py:331-400`, rates per type in `env_metrics.py:415`)."""
    pack = synthetic_scene_pack(seed=1, num_scenes=1, agents_per_scene=2, sim_steps=40)
    init = np.array(pack.init_states)
    init[0] = [0.0, 0.0, 12.0, 0.0]
    init[1] = [8.0, 0.0, 0.0, 0.0]
    pack = pack._replace(
        init_states=jnp.asarray(init),
        controlled_mask=jnp.ones(2, bool),
    )
    cfg = SimConfig(num_simulation_steps=40, n_step_action=5, raster_size=64, hist_frames=10)
    state, _ = simulate(pack, constant_policy(0.0, 0.0), jax.random.key(0), cfg)
    ctype = np.asarray(state.collision_type_steps)
    # the striker hits FRONT-first, the struck agent is hit from the REAR;
    # after the (contact-free) pass-through the bearings flip, so only the
    # first-contact type and the absence of SIDE contacts are asserted
    assert ctype[0, 0] > 0 and ctype[0, 2] == 0  # striker: FRONT, never SIDE
    assert ctype[1, 1] > 0 and ctype[1, 2] == 0  # struck: REAR, never SIDE
    m = summarize_metrics(pack, state, cfg)
    assert m["collision_rate_front"] > 0 and m["collision_rate_rear"] > 0
    assert m["collision_rate_side"] == 0.0
    # typed step counts partition the untyped collision counter
    np.testing.assert_allclose(
        ctype.sum(-1), np.asarray(state.collision_steps), rtol=1e-6)


def test_observation_carries_gt_future():
    """render_observation exposes the dataset future (target_* channels) in
    the agent frame, matching the pack's world-frame GT replay — the
    reference's observation carries the scene GT (`env_trajdata.py:314-369`)."""
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=2, sim_steps=20)
    state = init_sim_state(pack, CFG)
    obs = render_observation(pack, state, CFG)
    assert obs.target_availabilities.shape == (2, 52)
    # frames 1..20 available from step 0, the padded tail unavailable
    np.testing.assert_allclose(np.asarray(obs.target_availabilities[:, :20]), 1.0)
    np.testing.assert_allclose(np.asarray(obs.target_availabilities[:, 20:]), 0.0)
    # agent-frame target at k maps back to the world GT at frame k+1
    wfa = np.asarray(world_from_agent_matrix(state.states[:, :2], state.states[:, 3]))
    tgt = np.asarray(obs.target_positions)  # [Na, 52, 2]
    k = 4
    back = np.einsum("nij,nj->ni", wfa[:, :2, :2], tgt[:, k]) + wfa[:, :2, 2]
    np.testing.assert_allclose(
        back, np.asarray(pack.gt_states[:, k + 1, :2]), atol=1e-4)
