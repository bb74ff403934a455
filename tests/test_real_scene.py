"""Real-scene closed loop: converted shards -> ScenePack -> on-device sim.

Mirrors the reference's reset-from-dataset semantics
(`env_trajdata.py:154-231`): world map, init states, and replay actions all
come from converted data, not the synthetic road generator.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cld_tpu.data.convert import convert_synthetic
from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.sim.env import SimConfig, init_sim_state, simulate
from cld_tpu.sim.scene import (
    scene_pack_from_batches,
    scene_pack_from_shards,
)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scene_shards"))
    convert_synthetic(out, num_batches=2, batch_size=4, raster_size=64, seed=0)
    return out


def test_scene_pack_from_batches_shapes_and_world():
    batch = synthetic_batch(seed=0, batch_size=4, raster_size=64)
    pack = scene_pack_from_batches(
        batch,
        scene_index=np.array([0, 0, 1, 1]),
        sim_steps=30,
        world_map_size=256,
    )
    assert pack.world_map.shape == (2, 256, 256, 3)
    assert pack.init_states.shape == (4, 4)
    assert pack.replay_actions.shape == (4, 30, 2)
    # stitched drivable layer is non-trivial: some road, some off-road
    driv = np.asarray(pack.world_map[..., 0])
    assert 0.02 < driv.mean() < 0.98
    # agents start on the drivable region of their own stitched map
    st = init_sim_state(pack, SimConfig(num_simulation_steps=30, raster_size=64))
    from cld_tpu.sim.env import drivable_at_world

    on_road = np.asarray(drivable_at_world(pack, pack.init_states[:, :2]))
    assert (on_road > 0).all()
    # scene indices densified
    np.testing.assert_array_equal(np.asarray(pack.scene_index), [0, 0, 1, 1])


def test_scene_pack_replay_matches_gt_future():
    """Replaying the inverse-dynamics actions through the simulator
    reproduces the GT future: the inverse of the reference's
    convert_action_to_state_and_action round trip."""
    batch = synthetic_batch(seed=1, batch_size=2, raster_size=64)
    pack = scene_pack_from_batches(
        batch, sim_steps=20, world_map_size=256,
        controlled_mask=np.zeros(2, bool),  # everyone replays
    )
    cfg = SimConfig(num_simulation_steps=20, n_step_action=5, raster_size=64)

    def null_policy(obs, rng):
        return jnp.zeros((2, 52, 2))

    _, traj = jax.jit(lambda r: simulate(pack, null_policy, r, cfg))(jax.random.key(0))
    # GT future in world frame = agent-frame targets + world offset (yaw=0
    # placements for agent-centric synthetic data)
    w = np.asarray(pack.init_states[:, :2])
    gt_world = np.asarray(batch.target_positions)[:, :20] + w[:, None]
    got = np.asarray(traj).transpose(1, 0, 2)[:, :, :2]  # [B, T, 2]
    # the sim integrates with bounded unicycle + midpoint; GT was built by
    # the same integrator, so agreement should be tight
    err = np.linalg.norm(got - gt_world, axis=-1)
    assert err.max() < 0.75, err.max()


def test_scene_pack_from_shards_and_closed_loop(shard_dir):
    pack = scene_pack_from_shards(
        shard_dir, num_scenes=2, agents_per_scene=3, sim_steps=15,
        world_map_size=256,
    )
    assert pack.num_agents == 6
    cfg = SimConfig(num_simulation_steps=15, n_step_action=5, raster_size=64)

    from cld_tpu.policies.hardcoded import replay_policy

    policy = replay_policy(pack.replay_actions)
    state, traj = jax.jit(lambda r: simulate(pack, policy, r, cfg))(jax.random.key(0))
    assert np.isfinite(np.asarray(traj)).all()
    from cld_tpu.sim.metrics import summarize_metrics

    m = summarize_metrics(pack, state, cfg)
    assert np.isfinite(list(m.values())).all() if hasattr(np, "all") else True
    # replayed GT on its own stitched map should stay mostly on-road
    assert m["offroad_rate"] < 0.35, m
