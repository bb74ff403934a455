"""Guidance engine tests: loss semantics, gradients, perturbation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.guidance.losses import (
    AccLimitLoss,
    AgentCollisionLoss,
    GuidanceContext,
    MapCollisionLoss,
    SpeedLimitLoss,
    StopSignLoss,
    TargetPosAtTimeLoss,
    TargetPosLoss,
    TargetSpeedLoss,
)
from cld_tpu.guidance.perturbation import (
    GuidanceSpec,
    choose_best_sample,
    compute_guidance_loss,
    make_perturbation_guidance,
    perturb,
)
from cld_tpu.ops.geometry import world_from_agent_matrix


def make_ctx(B=3, raster_size=64, scene_index=None):
    batch = synthetic_batch(seed=0, batch_size=B, raster_size=raster_size)
    pos = jnp.zeros((B, 2))
    yaw = jnp.zeros((B,))
    return GuidanceContext(
        drivable_map=batch.drivable_map,
        raster_from_agent=batch.raster_from_agent,
        extent=batch.extent,
        curr_speed=batch.curr_speed,
        world_from_agent=world_from_agent_matrix(pos, yaw),
        scene_index=jnp.asarray(scene_index if scene_index is not None else np.zeros(B, np.int32)),
    )


def straight_traj(B=3, N=2, T=52, speed=5.0, y_off=0.0):
    t = jnp.arange(1, T + 1) * 0.1
    x = jnp.zeros((B, N, T, 6))
    x = x.at[..., 0].set(speed * t)
    x = x.at[..., 1].set(y_off)
    x = x.at[..., 2].set(speed)
    return x


def test_target_speed_loss():
    ctx = make_ctx()
    x = straight_traj(speed=5.0)
    loss = TargetSpeedLoss(target_speed=np.full(3, 5.0))(x, ctx)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)
    loss2 = TargetSpeedLoss(target_speed=np.full(3, 8.0))(x, ctx)
    np.testing.assert_allclose(np.asarray(loss2), 3.0, atol=1e-5)


def test_speed_and_acc_limits():
    ctx = make_ctx()
    x = straight_traj(speed=20.0)
    assert (np.asarray(SpeedLimitLoss(speed_limit=15.0)(x, ctx)) > 4.9).all()
    assert (np.asarray(SpeedLimitLoss(speed_limit=25.0)(x, ctx)) == 0).all()
    x = x.at[..., 4].set(5.0)
    assert (np.asarray(AccLimitLoss(acc_limit=2.0)(x, ctx)) > 2.9).all()


def test_agent_collision_loss_detects_overlap():
    # two agents in the same scene driving on top of each other
    ctx = make_ctx(B=2)
    x = straight_traj(B=2, N=1, speed=5.0)
    loss_overlap = AgentCollisionLoss()(x, ctx)
    assert float(loss_overlap.sum()) > 0
    # separate lanes -> no collision
    x_sep = x.at[1, ..., 1].set(10.0)
    loss_sep = AgentCollisionLoss()(x_sep, ctx)
    np.testing.assert_allclose(np.asarray(loss_sep), 0.0, atol=1e-6)
    # different scenes -> no collision even when overlapping
    ctx2 = make_ctx(B=2, scene_index=np.array([0, 1], np.int32))
    loss_scenes = AgentCollisionLoss()(x, ctx2)
    np.testing.assert_allclose(np.asarray(loss_scenes), 0.0, atol=1e-6)


def test_agent_collision_excluded_agents_pairs_only():
    """Reference excluded_agents semantics (`guidance_loss.py:586-593`):
    only pairs with BOTH ends excluded are un-penalized; excluded-vs-
    included collisions still count, so a singleton set is a no-op."""
    ctx = make_ctx(B=3)
    x = straight_traj(B=3, N=1, speed=5.0)  # all three on top of each other
    base = np.asarray(AgentCollisionLoss()(x, ctx))
    assert base.min() > 0
    one = np.asarray(AgentCollisionLoss(excluded_agents=(1,))(x, ctx))
    np.testing.assert_allclose(one, base, atol=1e-6)
    two = np.asarray(AgentCollisionLoss(excluded_agents=(0, 1))(x, ctx))
    # the 0-1 collision is forgiven, but 0 and 1 still collide with 2
    assert (two[:2] < base[:2]).all() and two[:2].min() > 0
    np.testing.assert_allclose(two[2], base[2], atol=1e-6)
    # block-diagonal path agrees with the flat path
    blk = np.asarray(
        AgentCollisionLoss(excluded_agents=(0, 1), scene_block=3)(x, ctx)
    )
    np.testing.assert_allclose(blk, two, atol=1e-5)


def test_target_speed_profile_shorter_than_horizon():
    """[B, T_fut] per-timestep target profiles penalize only the first
    T_fut plan steps (`guidance_loss.py:245-248` slices cur_speed[:valid_T])."""
    ctx = make_ctx()
    x = straight_traj(speed=5.0)
    prof = np.full((3, 20), 8.0, np.float32)
    loss = TargetSpeedLoss(target_speed=prof)(x, ctx)
    np.testing.assert_allclose(np.asarray(loss), 3.0, atol=1e-5)
    # profile longer than the horizon: extra columns are ignored
    prof_long = np.full((3, 80), 8.0, np.float32)
    loss_long = TargetSpeedLoss(target_speed=prof_long)(x, ctx)
    np.testing.assert_allclose(np.asarray(loss_long), 3.0, atol=1e-5)


def test_target_speed_profile_advances_with_global_t():
    """A [B, T_fut] profile is a per-GLOBAL-frame schedule: the loss cuts
    out the window at ctx.global_t (`guidance_loss.py:231`
    `target_speed[..., global_t:global_t+T]`), so later replans compare
    the plan against LATER profile frames, and a fully elapsed profile
    contributes zero."""
    B, T = 3, 52
    ctx0 = make_ctx(B=B)
    x = straight_traj(B=B, N=2, T=T, speed=0.0)
    # profile = global frame index, distinct per frame
    prof = np.tile(np.arange(100, dtype=np.float32), (B, 1))
    loss0 = TargetSpeedLoss(target_speed=prof)(x, ctx0)
    # at gt=0: mean over frames 0..51 of |0 - t| = mean(0..51) = 25.5
    np.testing.assert_allclose(np.asarray(loss0), 25.5, atol=1e-4)
    ctx10 = ctx0._replace(global_t=jnp.asarray(10, jnp.int32))
    loss10 = TargetSpeedLoss(target_speed=prof)(x, ctx10)
    np.testing.assert_allclose(np.asarray(loss10), 35.5, atol=1e-4)
    # window partially past the profile end: mean over the 100-60=40 valid
    ctx60 = ctx0._replace(global_t=jnp.asarray(60, jnp.int32))
    loss60 = TargetSpeedLoss(target_speed=prof)(x, ctx60)
    np.testing.assert_allclose(np.asarray(loss60), np.arange(60, 100).mean(), atol=1e-4)
    # fully elapsed -> zero (the reference's dummy-loss branch)
    ctx200 = ctx0._replace(global_t=jnp.asarray(200, jnp.int32))
    loss200 = TargetSpeedLoss(target_speed=prof)(x, ctx200)
    np.testing.assert_allclose(np.asarray(loss200), 0.0, atol=1e-6)


def test_agent_collision_gradient_separates():
    ctx = make_ctx(B=2)
    # slightly offset lanes, still within collision distance (not exactly
    # coincident — the distance gradient is degenerate at zero separation)
    x = straight_traj(B=2, N=1, speed=5.0)
    x = x.at[1, ..., 1].set(1.0)

    def cost(x):
        return AgentCollisionLoss()(x, ctx).sum()

    g = jax.grad(cost)(x)
    # gradient on y should push agents apart (nonzero, opposite signs)
    gy = np.asarray(g[..., 1]).sum(axis=(1, 2))
    assert abs(gy).max() > 0


def test_map_collision_loss():
    ctx = make_ctx()
    on_road = straight_traj(y_off=0.0)
    off_road = straight_traj(y_off=6.9)  # straddles the 7 m road edge
    l_on = MapCollisionLoss()(on_road, ctx)
    l_off = MapCollisionLoss()(off_road, ctx)
    np.testing.assert_allclose(np.asarray(l_on), 0.0, atol=1e-6)
    assert float(l_off.sum()) > 0
    # gradient pulls back toward the road (negative y direction)
    g = jax.grad(lambda x: MapCollisionLoss()(x, ctx).sum())(off_road)
    assert float(np.asarray(g[..., 1]).sum()) > 0  # dL/dy > 0 => descent lowers y


def test_map_collision_prepacked_matches_jnp():
    """The pallas bit-gather path on a pre-packed context (interpret mode)
    produces the same loss values and gradients as the jnp gather path."""
    from cld_tpu.ops.pallas_kernels import pack_drivable_bits

    ctx = make_ctx()
    ctx_packed = ctx._replace(drivable_packed=pack_drivable_bits(ctx.drivable_map))
    x = straight_traj(y_off=6.9)
    l_jnp = MapCollisionLoss(gather_impl="jnp")(x, ctx)
    l_pal = MapCollisionLoss(gather_impl="pallas")(x, ctx_packed)
    np.testing.assert_allclose(np.asarray(l_pal), np.asarray(l_jnp), rtol=1e-6)
    g_jnp = jax.grad(lambda v: MapCollisionLoss(gather_impl="jnp")(v, ctx).sum())(x)
    g_pal = jax.grad(
        lambda v: MapCollisionLoss(gather_impl="pallas")(v, ctx_packed).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_jnp), rtol=1e-5, atol=1e-7)


def test_map_collision_bbox_prepack_matches_recompute():
    """prepack_map_bbox hoists the bbox point grid + [B, P, P] distance
    cache out of the sampling scan; the loss must produce identical values
    and gradients with and without the prepacked fields, and fall back to
    recomputing when P disagrees with the loss's num_points_lw."""
    from cld_tpu.guidance.losses import prepack_map_bbox

    ctx = make_ctx()
    ctx_pre = prepack_map_bbox(ctx)
    assert ctx_pre.bbox_pts.shape[1:3] == (10, 10)
    assert ctx_pre.bbox_d2.shape[-1] == 100
    # idempotent
    assert prepack_map_bbox(ctx_pre).bbox_pts is ctx_pre.bbox_pts
    x = straight_traj(y_off=6.9)
    for impl in ("rigid", "separable", "pairwise"):
        loss = MapCollisionLoss(min_dist_impl=impl)
        l0 = loss(x, ctx)
        l1 = loss(x, ctx_pre)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-6)
    g0 = jax.grad(lambda v: MapCollisionLoss()(v, ctx).sum())(x)
    g1 = jax.grad(lambda v: MapCollisionLoss()(v, ctx_pre).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-6, atol=1e-8)
    # grid mismatch -> silently recomputes with the loss's own grid; this
    # includes a DIFFERENT factorization of the SAME point count (a flat
    # P == P check would wrongly reuse the (10, 10) prepack for (20, 5))
    for grid in ((6, 5), (20, 5)):
        l_mis = MapCollisionLoss(num_points_lw=grid)(x, ctx_pre)
        l_ref = MapCollisionLoss(num_points_lw=grid)(x, ctx)
        np.testing.assert_allclose(np.asarray(l_mis), np.asarray(l_ref), rtol=1e-6)
    # with_d2=False (the separable default's prepack) skips the [B, P, P]
    # cache but keeps the grid; a rigid-path prepack on top fills it in
    ctx_nod2 = prepack_map_bbox(ctx, with_d2=False)
    assert ctx_nod2.bbox_d2 is None and ctx_nod2.bbox_pts.shape[1:3] == (10, 10)
    l_sep = MapCollisionLoss(min_dist_impl="separable")(x, ctx_nod2)
    np.testing.assert_allclose(
        np.asarray(l_sep),
        np.asarray(MapCollisionLoss(min_dist_impl="separable")(x, ctx)),
        rtol=1e-6,
    )
    assert prepack_map_bbox(ctx_nod2).bbox_d2 is not None


def test_make_perturbation_guidance_prepacks_on_tpu_only():
    """The guidance choke point pre-packs the drivable map exactly when the
    pallas bit-gather will consume it (TPU backend); on CPU it is a no-op,
    and a second application is idempotent either way."""
    from cld_tpu.guidance.losses import prepack_drivable

    ctx = make_ctx()
    # CPU backend (tests force it): prepack is a no-op
    assert prepack_drivable(ctx).drivable_packed is None
    # idempotence with an already-filled field
    from cld_tpu.ops.pallas_kernels import pack_drivable_bits

    packed = pack_drivable_bits(ctx.drivable_map)
    ctx2 = ctx._replace(drivable_packed=packed)
    assert prepack_drivable(ctx2).drivable_packed is packed


def test_resolve_compute_dtype_spellings():
    import jax.numpy as jnp
    import pytest

    from cld_tpu.training.state import resolve_compute_dtype

    assert resolve_compute_dtype("auto") == jnp.float32  # CPU backend here
    assert resolve_compute_dtype("bf16-mixed") == jnp.bfloat16
    assert resolve_compute_dtype("16-mixed") == jnp.bfloat16
    assert resolve_compute_dtype("fp32") == jnp.float32
    with pytest.raises(ValueError, match="precision"):
        resolve_compute_dtype("float8")


def test_bit_gather_prepacked_rejects_raw_map():
    import pytest

    from cld_tpu.ops.pallas_kernels import drivable_bit_gather_pallas

    ctx = make_ctx()
    pix = jnp.zeros((3, 8, 2), jnp.int32)
    with pytest.raises(TypeError, match="pack_drivable_bits"):
        drivable_bit_gather_pallas(
            pix, ctx.drivable_map, interpret=True, prepacked=True
        )


def test_target_pos_losses():
    ctx = make_ctx()
    x = straight_traj(speed=5.0)
    tgt = np.asarray(x[:, 0, 30, :2])  # on-trajectory waypoints
    l_at = TargetPosAtTimeLoss(target_pos=tgt, target_time=np.full(3, 30))(x, ctx)
    np.testing.assert_allclose(np.asarray(l_at), 0.0, atol=1e-5)
    l_any = TargetPosLoss(target_pos=tgt)(x, ctx)
    assert float(l_any.max()) < 0.1


def test_stop_sign_loss():
    """Reference STL semantics (stl_traffic_rules.py:74-125): the rule
    penalizes trajectories that are in the stop box without stopping, and
    is INERT (zero loss, zero gradient) for trajectories currently outside
    the box at speed — the `out_box & middle_speed` disjunct."""
    ctx = make_ctx()
    box = dict(
        stop_sign_pos=np.tile([10.0, 0.0], (3, 1)).astype(np.float32),
        stop_box_dim=np.tile([5.0, 2.0], (3, 1)).astype(np.float32),
    )
    rule = StopSignLoss(**box)

    # starts INSIDE the box moving at 5 m/s, never stops -> violated
    inside_fast = straight_traj(speed=5.0)
    inside_fast = inside_fast.at[..., 0].add(10.0)
    assert (np.asarray(rule(inside_fast, ctx)) > 0).all()

    # stopped inside the box -> satisfied
    stopped = jnp.zeros((3, 2, 52, 6)).at[..., 0].set(10.0)
    assert float(rule(stopped, ctx).max()) < 0.2

    # outside the box at speed -> the disjunct holds: no loss, no gradient
    away = straight_traj(speed=5.0, y_off=30.0)
    l_away = rule(away, ctx)
    np.testing.assert_allclose(np.asarray(l_away), 0.0, atol=1e-6)
    g = jax.grad(lambda x: rule(x, ctx).sum())(away)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)

    # legacy param spelling still parses (alias stop_box_center)
    from cld_tpu.guidance.parsing import specs_from_configs

    specs = specs_from_configs(
        [{"name": "stop_sign", "weight": 1.0,
          "params": {"stop_box_center": [10.0, 0.0],
                     "stop_box_dim": [5.0, 2.0]}}],
        num_agents=3,
    )
    assert (np.asarray(specs[0].loss(inside_fast, ctx)) > 0).all()


def test_compute_guidance_loss_weights_and_masks():
    ctx = make_ctx()
    x = straight_traj(speed=20.0)
    specs = [
        GuidanceSpec(SpeedLimitLoss(speed_limit=15.0), weight=2.0),
        GuidanceSpec(AccLimitLoss(acc_limit=100.0), weight=1.0),
    ]
    total, per = compute_guidance_loss(x, ctx, specs)
    assert len(per) == 2
    np.testing.assert_allclose(float(total), 2.0 * 5.0, atol=1e-4)
    # masking agent 0 only
    specs_masked = [
        GuidanceSpec(SpeedLimitLoss(speed_limit=15.0), weight=1.0,
                     agent_mask=(True, False, False)),
    ]
    total_m, _ = compute_guidance_loss(x, ctx, specs_masked)
    np.testing.assert_allclose(float(total_m), 5.0, atol=1e-4)


def test_perturb_reduces_cost():
    ctx = make_ctx()
    x = straight_traj(speed=20.0)
    specs = [GuidanceSpec(SpeedLimitLoss(speed_limit=15.0))]

    def decode_fn(z):
        return z  # identity: guide raw trajectories directly

    x_new = perturb(x, ctx, specs, decode_fn, lr=0.5, grad_steps=5)
    c0, _ = compute_guidance_loss(x, ctx, specs)
    c1, _ = compute_guidance_loss(x_new, ctx, specs)
    assert float(c1) < float(c0)


def test_perturb_th_clips_delta():
    ctx = make_ctx()
    x = straight_traj(speed=20.0)
    specs = [GuidanceSpec(SpeedLimitLoss(speed_limit=0.0), weight=100.0)]
    x_new = perturb(x, ctx, specs, lambda z: z, lr=10.0, grad_steps=3, perturb_th=0.01)
    assert float(jnp.abs(x_new - x).max()) <= 0.0101


def test_guidance_fn_in_sampler():
    """The perturbation hook works inside the jitted sampling scan."""
    from cld_tpu.algos.dm import sample_traj
    from cld_tpu.ops.diffusion import make_schedule

    ctx = make_ctx(B=2)
    sch = make_schedule(5)

    def decode_fn(z):
        # treat latents as [B*N, T, 4] -> fake traj [B, N, T, 6]
        B = 2
        N = z.shape[0] // B
        traj = jnp.concatenate([z, jnp.zeros_like(z[..., :2])], axis=-1)
        return traj.reshape(B, N, *traj.shape[1:])

    specs = [GuidanceSpec(SpeedLimitLoss(speed_limit=0.1))]
    gfn = make_perturbation_guidance(ctx, specs, decode_fn, lr=0.1, grad_steps=1)
    dn = lambda x, c, t: jnp.zeros_like(x)
    out = jax.jit(
        lambda r: sample_traj(dn, sch, r, jnp.zeros((2, 8)), 52, 4, guidance_fn=gfn)
    )(jax.random.key(0))
    assert np.isfinite(np.asarray(out["pred_traj"])).all()


def test_choose_best_sample():
    samples = jnp.arange(2 * 3 * 4).reshape(2, 3, 4).astype(jnp.float32)
    losses = jnp.array([[3.0, 1.0, 2.0], [0.5, 2.0, 1.0]])
    best, idx = choose_best_sample(samples, losses)
    np.testing.assert_array_equal(np.asarray(idx), [1, 0])
    np.testing.assert_allclose(np.asarray(best[0]), np.asarray(samples[0, 1]))
    np.testing.assert_allclose(np.asarray(best[1]), np.asarray(samples[1, 0]))


def test_choose_best_sample_scene_level():
    """Scene-coupled rules force ONE shared sample per scene: argmin of the
    agent-summed loss (`choose_action_from_guidance`, guidance_loss.py:
    49-56) — per-agent independent picks would execute pair-trajectory
    combinations the collision loss never scored."""
    from cld_tpu.guidance.perturbation import is_scene_level_spec
    from cld_tpu.guidance.losses import (
        AgentCollisionLoss,
        CollisionAttackLoss,
        SpeedLimitLoss,
    )
    from cld_tpu.guidance.perturbation import GuidanceSpec

    samples = jnp.arange(4 * 3 * 2).reshape(4, 3, 2).astype(jnp.float32)
    # scene 0 = agents {0, 1}: summed loss per sample [4, 3, 3] -> best n=2
    # even though agent 0 alone would pick n=0
    losses = jnp.array(
        [[1.0, 5.0, 2.0], [5.0, 5.0, 1.0], [9.0, 0.0, 9.0], [0.0, 8.0, 9.0]]
    )
    scene = jnp.array([0, 0, 1, 1])
    best, idx = choose_best_sample(samples, losses, scene, scene_level=True)
    np.testing.assert_array_equal(np.asarray(idx), [2, 2, 1, 1])
    np.testing.assert_allclose(np.asarray(best[0]), np.asarray(samples[0, 2]))
    # without scene_level: independent picks
    _, idx_ind = choose_best_sample(samples, losses, scene, scene_level=False)
    np.testing.assert_array_equal(np.asarray(idx_ind), [0, 2, 1, 0])
    # rule classification matches the reference's name list
    assert is_scene_level_spec(GuidanceSpec(AgentCollisionLoss(), 1.0))
    assert is_scene_level_spec(
        GuidanceSpec(CollisionAttackLoss(attacker_ind=0, victim_ind=1), 1.0)
    )
    assert not is_scene_level_spec(GuidanceSpec(SpeedLimitLoss(speed_limit=5.0), 1.0))


def test_lane_following_loss():
    from cld_tpu.guidance.losses import LaneFollowingLoss

    B = 2
    base = make_ctx(B=B)
    # straight lane along x at y=0, heading 0
    L = 20
    lane = np.zeros((B, L, 3), np.float32)
    lane[..., 0] = np.linspace(0, 40, L)
    ctx = base._replace(lane_points=jnp.asarray(lane), lane_avail=jnp.ones((B, L), bool))

    on_lane = straight_traj(B=B, N=1, speed=5.0, y_off=0.0)
    off_lane = straight_traj(B=B, N=1, speed=5.0, y_off=4.0)
    l_on = np.asarray(LaneFollowingLoss()(on_lane, ctx))
    l_off = np.asarray(LaneFollowingLoss()(off_lane, ctx))
    assert (l_off > l_on + 1.0).all()  # 4 m offset costs ~4 per step
    # gradient pulls the off-lane trajectory back toward the lane
    g = jax.grad(lambda x: LaneFollowingLoss()(x, ctx).sum())(off_lane)
    assert float(np.asarray(g[..., 1]).sum()) > 0  # descent lowers y
    # heading deviation penalized
    yawed = on_lane.at[..., 3].set(0.5)
    l_yaw = np.asarray(LaneFollowingLoss()(yawed, ctx))
    assert (l_yaw > l_on).all()


def test_global_target_pos_at_time_branches():
    from cld_tpu.guidance.losses import GlobalTargetPosAtTimeLoss

    B, N, T = 2, 2, 52
    ctx = make_ctx(B=B)
    x = straight_traj(B=B, N=N, T=T, speed=5.0)
    # identity world frame: agent frame == world frame
    # straight_traj's frame i sits at speed*(i+1)*dt
    tgt = np.stack([np.array([5.0 * 0.1 * 21, 0.0]), np.array([100.0, 0.0])])

    # agent 0: target frame 20 inside horizon -> exact branch, on-target == 0
    # agent 1: target frame 200 beyond horizon -> progress branch
    loss = GlobalTargetPosAtTimeLoss(
        target_pos_world=tgt,
        target_time=np.array([20, 200]),
        urgency=np.array([0.0, 0.0]),
        target_tolerance=None,
    )(x, ctx)
    assert loss.shape == (B, N)
    np.testing.assert_allclose(np.asarray(loss[0]), 0.0, atol=1e-5)
    # progress branch: covered 26 m of the 200*0.1*1.42=28.4 m goal -> >0
    assert (np.asarray(loss[1]) > 0).all()

    # global_t advances: frame 200 target becomes exact once t >= 148
    ctx_t = ctx._replace(global_t=jnp.asarray(190, jnp.int32))
    loss_t = GlobalTargetPosAtTimeLoss(
        target_pos_world=tgt,
        target_time=np.array([20, 200]),
        urgency=np.array([0.0, 0.0]),
        target_tolerance=None,
    )(x, ctx_t)
    # agent 0's target time has passed (local_tt < 0) -> masked to 0
    np.testing.assert_allclose(np.asarray(loss_t[0]), 0.0, atol=1e-6)
    # agent 1 now exact at local frame 10: traj is at x=5.5, target x=100
    assert (np.asarray(loss_t[1]) > 90).all()

    # tolerance masks agents already at the target
    near_tgt = np.zeros((B, 2), np.float32)
    loss_near = GlobalTargetPosAtTimeLoss(
        target_pos_world=near_tgt,
        target_time=np.array([20, 20]),
        urgency=np.array([0.0, 0.0]),
        target_tolerance=2.0,
    )(x, ctx)
    np.testing.assert_allclose(np.asarray(loss_near), 0.0, atol=1e-6)


def test_global_stop_sign_loss():
    from cld_tpu.guidance.losses import GlobalStopSignLoss

    B, N, T = 2, 1, 52
    ctx = make_ctx(B=B)
    box_pos = np.tile([10.0, 0.0], (B, 1)).astype(np.float32)
    box_dim = np.tile([8.0, 6.0], (B, 1)).astype(np.float32)
    rule = GlobalStopSignLoss(stop_sign_pos=box_pos, stop_box_dim=box_dim)

    # speeding INSIDE the box, never stopping -> violated (positive loss)
    fast = straight_traj(B=B, N=N, T=T, speed=8.0)
    fast = fast.at[..., 0].add(10.0)
    l_fast = rule(fast, ctx)
    assert (np.asarray(l_fast) > 0).all()

    # stopping inside the box -> satisfied (≈0 loss)
    stopped = jnp.zeros((B, N, T, 6)).at[..., 0].set(10.0)
    l_stop = rule(stopped, ctx)
    assert float(l_stop.max()) < 0.2

    # outside the box at speed -> the out_box & middle_speed disjunct
    # holds at trace start: zero loss (guidance_loss.py:1313 semantics)
    away = straight_traj(B=B, N=N, T=T, speed=8.0, y_off=40.0)
    np.testing.assert_allclose(np.asarray(rule(away, ctx)), 0.0, atol=1e-6)

    # already_stopped latch from world history: >= k low-speed in-box
    # frames within an action_num window (COUNT, not consecutive —
    # guidance_loss.py:1410) masks the loss even for a speeding plan
    hist = np.zeros((B, 6, 4), np.float32)
    hist[:, :, 0] = 10.0  # in box throughout
    hist[:, :, 2] = 0.1  # slow
    hist[:, 2, 2] = 3.0  # one fast frame in the middle: count still >= 3
    ctx_hist = ctx._replace(agent_hist_world=jnp.asarray(hist))
    l_masked = rule(fast, ctx_hist)
    np.testing.assert_allclose(np.asarray(l_masked), 0.0, atol=1e-6)

    # box exit releases the latch (outside_mask, guidance_loss.py:1419)
    hist_exit = hist.copy()
    hist_exit[:, -1, 0] = 100.0  # newest frame outside the box
    ctx_exit = ctx._replace(agent_hist_world=jnp.asarray(hist_exit))
    assert (np.asarray(rule(fast, ctx_exit)) > 0).all()

    # gradients flow (it sits inside the perturbation loop)
    g = jax.grad(lambda x: rule(x, ctx).sum())(fast)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_agent_collision_scan_matches_dense_reference():
    """The scan-over-T rewrite must reproduce the dense [N,T,B,B,D,D] math."""
    ctx = make_ctx(B=4, scene_index=np.array([0, 0, 1, 1], np.int32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3, (4, 2, 12, 6)).astype(np.float32))
    x = x.at[..., 2].set(5.0)
    loss = AgentCollisionLoss()

    got = np.asarray(loss(x, ctx))

    # dense oracle (the pre-rewrite implementation)
    import cld_tpu.guidance.losses as L

    B, N, T, _ = x.shape
    moving = jnp.abs(ctx.curr_speed) > loss.guide_moving_speed_th
    xm = L._mask_gradient(x, moving)
    pos_w, yaw_w = L._to_world(xm, ctx.world_from_agent)
    agt_rad = ctx.extent[:, 1] / 2.0
    cent_min = -(ctx.extent[:, 0] / 2.0) + agt_rad
    cent_max = (ctx.extent[:, 0] / 2.0) - agt_rad
    lin = jnp.linspace(0.0, 1.0, loss.num_disks)
    cent_x = cent_min[:, None] + (cent_max - cent_min)[:, None] * lin[None]
    centroids = jnp.stack([cent_x, jnp.zeros_like(cent_x)], axis=-1)
    c = jnp.cos(yaw_w)[..., None]
    s = jnp.sin(yaw_w)[..., None]
    cent = centroids[:, None, None]
    rx = cent[..., 0] * c[..., 0] + cent[..., 1] * (-s[..., 0])
    ry = cent[..., 0] * s[..., 0] + cent[..., 1] * c[..., 0]
    cent_w = jnp.stack([rx, ry], axis=-1) + pos_w[..., None, :]
    penalty_dists = agt_rad[:, None] + agt_rad[None, :] + loss.buffer_dist
    same_scene = ctx.scene_index[:, None] == ctx.scene_index[None, :]
    pair_valid = same_scene & ~jnp.eye(B, dtype=bool)
    d = cent_w.transpose(1, 2, 0, 3, 4)
    diff = d[:, :, :, None, :, None, :] - d[:, :, None, :, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)
    pair_dists = jnp.min(dist.reshape(N, T, B, B, -1), axis=-1)
    colliding = (pair_dists <= penalty_dists[None, None]) & pair_valid[None, None]
    penalties = jnp.where(colliding, 1.0 - pair_dists / penalty_dists[None, None], 0.0)
    w = L._decay_weights(T, loss.decay_rate)
    per_agent = jnp.sum(penalties * w[None, :, None, None], axis=1)
    want = np.asarray(jnp.where(moving[:, None], jnp.mean(per_agent, axis=-1).transpose(1, 0), 0.0))

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_agent_collision_scene_block_matches_flat():
    """The block-diagonal fast path (scene_block=A) is numerically identical
    to the flat [B, B] path — values AND gradients."""
    B, A = 8, 4
    scene_index = np.repeat(np.arange(B // A, dtype=np.int32), A)
    ctx = make_ctx(B=B, scene_index=scene_index)
    rng = np.random.default_rng(0)
    # overlapping cluster per scene so collisions actually fire
    x = straight_traj(B=B, N=2, speed=5.0)
    x = x + jnp.asarray(rng.normal(0, 0.8, x.shape), jnp.float32)

    flat = AgentCollisionLoss()
    blk = AgentCollisionLoss(scene_block=A)
    np.testing.assert_allclose(
        np.asarray(flat(x, ctx)), np.asarray(blk(x, ctx)), rtol=1e-5, atol=1e-6
    )
    g_flat = jax.grad(lambda v: flat(v, ctx).sum())(x)
    g_blk = jax.grad(lambda v: blk(v, ctx).sum())(x)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_blk), rtol=1e-4, atol=1e-6)


def test_agent_collision_dot_matches_diff():
    """The Gram-matmul ("dot") pairwise formulation of the scene_block path
    matches the difference-tensor ("diff") path to float rounding — values
    AND gradients — including at realistic world offsets where the centered
    norm expansion must not lose precision."""
    B, A = 8, 4
    scene_index = np.repeat(np.arange(B // A, dtype=np.int32), A)
    ctx = make_ctx(B=B, scene_index=scene_index)
    # push the scenes ~100 m from the origin (worst case for |p|^2 - 2ab)
    # while keeping agents of a scene within collision range of each other
    pos = jnp.asarray(
        np.stack(
            [100.0 + 20.0 * scene_index + 1.2 * (np.arange(B) % A),
             np.full(B, -80.0)],
            -1,
        ),
        jnp.float32,
    )
    ctx = ctx._replace(world_from_agent=world_from_agent_matrix(pos, jnp.zeros((B,))))
    rng = np.random.default_rng(0)
    x = straight_traj(B=B, N=2, speed=5.0)
    x = x + jnp.asarray(rng.normal(0, 0.8, x.shape), jnp.float32)

    diff = AgentCollisionLoss(scene_block=A, pairwise_impl="diff")
    dot = AgentCollisionLoss(scene_block=A, pairwise_impl="dot")
    v_diff = np.asarray(diff(x, ctx))
    v_dot = np.asarray(dot(x, ctx))
    assert v_diff.max() > 0  # collisions actually fire
    np.testing.assert_allclose(v_dot, v_diff, rtol=2e-4, atol=1e-6)
    g_diff = jax.grad(lambda v: diff(v, ctx).sum())(x)
    g_dot = jax.grad(lambda v: dot(v, ctx).sum())(x)
    np.testing.assert_allclose(
        np.asarray(g_dot), np.asarray(g_diff), rtol=2e-3, atol=2e-5
    )


def test_map_collision_custom_vjp_matches_bruteforce():
    """The O(P) custom backward of _min_dist_to_onroad routes each column's
    cotangent through its argmin row — gradients must equal the naive
    differentiate-through-the-P^2-matrix form."""
    from cld_tpu.guidance.losses import _min_dist_to_onroad

    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(0, 2.0, (3, 7, 2)), jnp.float32)
    onroad = jnp.asarray(rng.random((3, 7)) > 0.4)
    onroad = onroad.at[0, :].set(True)  # one fully on-road row block

    def naive(p):
        det = jax.lax.stop_gradient(p)
        d2 = jnp.sum((p[..., :, None, :] - det[..., None, :, :]) ** 2, -1)
        d2 = jnp.where(onroad[..., :, None], d2, 1e12)
        return jnp.sqrt(jnp.min(d2, axis=-2) + 1e-12)

    np.testing.assert_allclose(
        np.asarray(_min_dist_to_onroad(pts, onroad)), np.asarray(naive(pts)),
        rtol=1e-6)
    # weight columns arbitrarily so cotangents differ per column
    w = jnp.asarray(rng.normal(0, 1, (3, 7)), jnp.float32)
    g_fast = jax.grad(lambda p: jnp.sum(_min_dist_to_onroad(p, onroad) * w))(pts)
    g_naive = jax.grad(lambda p: jnp.sum(naive(p) * w))(pts)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_naive),
                               rtol=1e-4, atol=1e-6)


def test_min_dist_separable_matches_rigid():
    """The separable exact-EDT kernel produces the same distances as the
    all-pairs rigid kernel, and the factored equality backward matches the
    rigid tie-splitting backward away from exact ties (random masks)."""
    from cld_tpu.guidance.losses import _min_dist_rigid, _min_dist_separable

    rng = np.random.default_rng(3)
    B, Q, R, C = 4, 6, 5, 7
    P = R * C
    lw = jnp.asarray(rng.uniform(1.5, 4.5, (B, 2)), jnp.float32)
    # IRREGULAR strictly-monotone grid coordinates: the kernels only need
    # the product-grid structure, and generic spacing removes exact
    # distance ties — on a REGULAR grid the two formulations round tied
    # candidates differently ((dl*L)^2+(dw*W)^2 vs dl^2*L^2 + dw^2*W^2),
    # so one sees a tie the other misses and the split gradients diverge
    # by design (the in-loss test below covers that case via cosine)
    li = jnp.asarray(np.sort(rng.uniform(-0.5, 0.5, R)), jnp.float32)
    wi = jnp.asarray(np.sort(rng.uniform(-0.5, 0.5, C)), jnp.float32)
    rd2 = ((li[:, None] - li[None]) ** 2)[None] * (lw[:, 0] ** 2)[:, None, None]
    cd2 = ((wi[:, None] - wi[None]) ** 2)[None] * (lw[:, 1] ** 2)[:, None, None]
    grid = jnp.stack(jnp.meshgrid(li, wi, indexing="ij"), -1).reshape(P, 2)
    pts_local = grid[None] * lw[:, None, :]  # [B, P, 2]
    d2_local = jnp.sum(
        (pts_local[:, :, None] - pts_local[:, None, :]) ** 2, -1
    )
    # random poses -> pts; random onroad incl. an all-offroad row
    ang = rng.uniform(0, 2 * np.pi, (B, Q))
    ca, sa = np.cos(ang), np.sin(ang)
    rot = jnp.asarray(np.stack([ca, sa, -sa, ca], -1).reshape(B, Q, 2, 2),
                      jnp.float32)
    pts = jnp.einsum("bpc,bqcd->bqpd", pts_local, rot)
    onroad = jnp.asarray(rng.random((B, Q, P)) > 0.35)
    onroad = onroad.at[1, 2].set(False)  # one all-offroad (q) block

    d_rig = _min_dist_rigid(pts, d2_local[:, None], onroad)
    d_sep = _min_dist_separable(pts, onroad, rd2, cd2)
    np.testing.assert_allclose(
        np.asarray(d_sep), np.asarray(d_rig), rtol=1e-5, atol=1e-5
    )
    # cotangents only at OFF-road columns of rows with an on-road partner —
    # exactly how MapCollisionLoss consumes the kernel (an on-road column
    # has distance 0 to itself, so g/d would amplify ulp-level value
    # differences between the two formulations into visible noise)
    g = jnp.asarray(rng.normal(0, 1, (B, Q, P)), jnp.float32)
    g = jnp.where(jnp.any(onroad, axis=-1, keepdims=True) & ~onroad, g, 0.0)
    gr = jax.grad(lambda p: jnp.sum(_min_dist_rigid(p, d2_local[:, None], onroad) * g))(pts)
    gs = jax.grad(lambda p: jnp.sum(_min_dist_separable(p, onroad, rd2, cd2) * g))(pts)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr), rtol=1e-3, atol=1e-4)


def test_map_collision_separable_matches_rigid_in_loss():
    """MapCollisionLoss(min_dist_impl='separable', the default) equals the
    rigid path (values) on the standard scenario, with aligned gradients."""
    ctx = make_ctx()
    x = straight_traj(y_off=6.9)
    l_rig = MapCollisionLoss(min_dist_impl="rigid")(x, ctx)
    l_sep = MapCollisionLoss(min_dist_impl="separable")(x, ctx)
    np.testing.assert_allclose(np.asarray(l_sep), np.asarray(l_rig),
                               rtol=1e-5, atol=1e-6)
    g_rig = jax.grad(lambda v: MapCollisionLoss(min_dist_impl="rigid")(v, ctx).sum())(x)
    g_sep = jax.grad(lambda v: MapCollisionLoss(min_dist_impl="separable")(v, ctx).sum())(x)
    # the regular grid hits exact ties where the two kernels split
    # differently (joint-even vs per-stage-even), so compare by cosine
    num = float(jnp.sum(g_rig * g_sep))
    den = float(jnp.linalg.norm(g_rig) * jnp.linalg.norm(g_sep))
    assert den > 0 and num / den > 0.999


def test_map_collision_separable_xy_matches_separable():
    """min_dist_impl='separable_xy' (routing-free moment backward at the
    (pos, yaw) boundary) produces BITWISE-equal loss values and matching
    gradients vs the default separable routing backward — including under
    rotation/curvature (the yaw gradient is assembled analytically from
    offset moments, with no trig in the backward)."""
    ctx = make_ctx()
    # curved, rotated trajectory so both pos and yaw gradients are exercised
    T = 52
    t = jnp.arange(1, T + 1) * 0.1
    x = jnp.zeros((3, 2, T, 6))
    x = x.at[..., 0].set(5.0 * t)
    x = x.at[..., 1].set(6.9 + 1.5 * jnp.sin(0.5 * t))
    x = x.at[..., 2].set(5.0)
    x = x.at[..., 3].set(0.75 * jnp.cos(0.5 * t))
    l_sep = MapCollisionLoss(min_dist_impl="separable")(x, ctx)
    l_xy = MapCollisionLoss(min_dist_impl="separable_xy")(x, ctx)
    # same _sep_stage_minima forward -> exactly equal values
    np.testing.assert_array_equal(np.asarray(l_xy), np.asarray(l_sep))
    g_sep = jax.grad(
        lambda v: MapCollisionLoss(min_dist_impl="separable")(v, ctx).sum()
    )(x)
    g_xy = jax.grad(
        lambda v: MapCollisionLoss(min_dist_impl="separable_xy")(v, ctx).sum()
    )(x)
    # identical tie rule (same bitwise equalities, same per-stage averaging),
    # so gradients agree to fp assembly rounding — the only difference is
    # (p_i - p_j) computed via routed world points vs Rot @ delta_local
    np.testing.assert_allclose(
        np.asarray(g_xy), np.asarray(g_sep), rtol=1e-4, atol=1e-6
    )


def test_map_collision_separable_xy_bf16_close():
    """The bf16 xy variant tracks the f32 path to bf16 tolerances: values
    within ~2^-8 relative, gradient direction cosine ~1 (the accepted error
    class of the rigid bf16 knob)."""
    ctx = make_ctx()
    T = 52
    t = jnp.arange(1, T + 1) * 0.1
    x = jnp.zeros((3, 2, T, 6))
    x = x.at[..., 0].set(5.0 * t)
    x = x.at[..., 1].set(6.9 + 1.5 * jnp.sin(0.5 * t))
    x = x.at[..., 2].set(5.0)
    x = x.at[..., 3].set(0.75 * jnp.cos(0.5 * t))
    l_f32 = MapCollisionLoss(min_dist_impl="separable_xy")(x, ctx)
    l_b16 = MapCollisionLoss(min_dist_impl="separable_xy_bf16")(x, ctx)
    np.testing.assert_allclose(
        np.asarray(l_b16), np.asarray(l_f32), rtol=3e-2, atol=3e-2
    )
    g_f32 = jax.grad(
        lambda v: MapCollisionLoss(min_dist_impl="separable_xy")(v, ctx).sum()
    )(x)
    g_b16 = jax.grad(
        lambda v: MapCollisionLoss(min_dist_impl="separable_xy_bf16")(v, ctx).sum()
    )(x)
    num = float(jnp.sum(g_f32 * g_b16))
    den = float(jnp.linalg.norm(g_f32) * jnp.linalg.norm(g_b16))
    assert den > 0 and num / den > 0.999


def test_separable_xy_tie_splitting_exact():
    """At an exactly symmetric configuration (an off-road column flanked by
    equidistant on-road columns) the moment backward must reproduce the
    per-stage even tie split of the routing backward, not a winner-take-all
    pick. Built directly on the kernel to control the tie."""
    from cld_tpu.guidance.losses import (
        _min_dist_separable,
        _min_dist_separable_xy,
    )

    # C=3 makes the grid exactly symmetric in fp (linspace = [-0.5, 0, 0.5]),
    # so target c=1 ties between cp=0 and cp=2 BITWISE — the ulp artifacts of
    # a 10-point linspace would break the tie, which is itself load-bearing
    # behavior (the equality backward only splits exact ties)
    R, C = 4, 3
    P = R * C
    B, Q = 1, 1
    li = jnp.linspace(-0.5, 0.5, R)
    wi = jnp.linspace(-0.5, 0.5, C)
    lw = jnp.asarray([[4.0, 2.0]])
    rd2 = ((li[:, None] - li[None]) ** 2)[None] * lw[:, 0:1, None] ** 2
    cd2 = ((wi[:, None] - wi[None]) ** 2)[None] * lw[:, 1:2, None] ** 2
    # column pattern per row: ON, off, ON
    on = jnp.tile(jnp.asarray([True, False, True]), (B, Q, R, 1))
    assert float(cd2[0, 0, 1]) == float(cd2[0, 2, 1])
    onf = on.reshape(B, Q, P)
    # cotangents only at OFF-road targets, as MapCollisionLoss masks them:
    # g at an on-road target (d = 1e-6) would amplify the routing backward's
    # self-route by 1e6 and its fp cancellation residue would swamp the
    # comparison (not a real-loss configuration)
    g = jnp.where(onf, 0.0, 1.0)
    pos = jnp.zeros((B, Q, 2))
    yaw = jnp.full((B, Q), 0.3)
    grid = jnp.stack(
        jnp.meshgrid(li * lw[0, 0], wi * lw[0, 1], indexing="ij"), -1
    ).reshape(P, 2)
    c, s = jnp.cos(yaw[0, 0]), jnp.sin(yaw[0, 0])
    rot = jnp.asarray([[c, -s], [s, c]])
    pts = (grid @ rot.T + pos[0, 0])[None, None]  # [1, 1, P, 2]
    d_ref = _min_dist_separable(pts, onf, rd2, cd2)
    d_xy = _min_dist_separable_xy(pos, yaw, onf, rd2, cd2, li, wi, lw)
    np.testing.assert_array_equal(np.asarray(d_xy), np.asarray(d_ref))
    # reference gradient: chain the per-point routing grads to (pos, yaw)
    def ref_loss(p, y):
        cc, ss = jnp.cos(y[0, 0]), jnp.sin(y[0, 0])
        rr = jnp.asarray([[cc, -ss], [ss, cc]])
        pp = (grid @ rr.T + p[0, 0])[None, None]
        return jnp.sum(_min_dist_separable(pp, onf, rd2, cd2) * g)

    gp_ref, gy_ref = jax.grad(ref_loss, argnums=(0, 1))(pos, yaw)
    gp_xy, gy_xy = jax.grad(
        lambda p, y: jnp.sum(
            _min_dist_separable_xy(p, y, onf, rd2, cd2, li, wi, lw) * g
        ),
        argnums=(0, 1),
    )(pos, yaw)
    np.testing.assert_allclose(np.asarray(gp_xy), np.asarray(gp_ref), rtol=1e-5, atol=1e-6)
    # true yaw grad is 0 by symmetry; the chained reference leaves ~1 ulp of
    # fp residue while the moment form is exactly zero
    np.testing.assert_allclose(np.asarray(gy_xy), np.asarray(gy_ref), rtol=1e-5, atol=1e-6)


def test_separable_variants_inside_sampling_scan():
    """The separable_xy / separable_xy_bf16 knobs must trace inside a
    lax.scan like the guided sampler's (custom_vjp under jax.grad under
    scan) and track the default path across steps."""
    ctx = make_ctx()
    # curved fixture: an exactly-axis-aligned trajectory (yaw == 0) sits on
    # a symmetry knife edge where tied sources cancel — there the routing
    # backward returns fp cancellation residue (which Adam amplifies to
    # +-lr) while the moment backward returns the exact symmetric zero, so
    # the impls only agree off the knife edge (any real pose)
    T = 52
    tt = jnp.arange(1, T + 1) * 0.1
    x0 = jnp.zeros((3, 2, T, 6))
    x0 = x0.at[..., 0].set(5.0 * tt)
    x0 = x0.at[..., 1].set(6.9 + 1.5 * jnp.sin(0.5 * tt))
    x0 = x0.at[..., 2].set(5.0)
    x0 = x0.at[..., 3].set(0.75 * jnp.cos(0.5 * tt))
    first = {}
    for impl in ("separable", "separable_xy", "separable_xy_bf16"):
        specs = [
            GuidanceSpec(MapCollisionLoss(min_dist_impl=impl), 10.0),
            GuidanceSpec(AgentCollisionLoss(), 10.0),
        ]
        gfn = make_perturbation_guidance(
            ctx, specs, lambda z: z, lr=0.3, grad_steps=1
        )

        @jax.jit
        def run(x):
            def step(h, t):
                return gfn(h, jnp.full((x.shape[0],), t, jnp.int32)), None

            out, _ = jax.lax.scan(step, x, jnp.arange(5))
            return out

        # 5 iterated steps: traces + stays finite (the offroad mask flips
        # make iterated trajectories chaotic, so cross-impl equality is
        # only meaningful for a single application)
        assert np.isfinite(np.asarray(run(x0))).all()
        first[impl] = np.asarray(
            jax.jit(gfn)(x0, jnp.zeros((x0.shape[0],), jnp.int32))
        )
    # Adam's first step is ~lr * sign(g) per element, which amplifies fp
    # noise on near-zero gradients to +-lr — exact equality is
    # ill-conditioned (raw-gradient equality is pinned by the tests above).
    # Assert instead that elements the default path perturbs decisively
    # (|delta| > lr/3) move the same direction under both variants.
    d_ref = first["separable"] - np.asarray(x0)
    strong = np.abs(d_ref) > 0.1
    assert strong.sum() > 50  # the fixture must actually exercise guidance
    for impl in ("separable_xy", "separable_xy_bf16"):
        d = first[impl] - np.asarray(x0)
        agree = np.sign(d[strong]) == np.sign(d_ref[strong])
        assert agree.mean() > 0.9, (impl, agree.mean())


def test_choose_closest_to_gt():
    """guide_with_gt selection: availability-masked closest-to-GT sample;
    agents with no valid GT fall back to sample 0
    (`choose_action_from_gt`, guidance_loss.py:67-100)."""
    import jax.numpy as jnp
    import numpy as np
    from cld_tpu.guidance.perturbation import choose_closest_to_gt

    B, N, T = 3, 4, 6
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0, 5, (B, N, T, 2)), jnp.float32)
    gt = jnp.asarray(rng.normal(0, 5, (B, T, 2)), jnp.float32)
    # make sample 2 exactly match GT for agent 0, sample 1 for agent 1
    pos = pos.at[0, 2].set(gt[0]).at[1, 1].set(gt[1])
    avail = jnp.ones((B, T)).at[2].set(0.0)  # agent 2: no GT
    samples = jnp.concatenate([pos, jnp.zeros((B, N, T, 4))], axis=-1)
    best, idx = choose_closest_to_gt(samples, pos, gt, avail)
    assert idx.tolist()[:2] == [2, 1]
    assert int(idx[2]) == 0  # fallback
    np.testing.assert_allclose(np.asarray(best[0, :, :2]), np.asarray(gt[0]))
    # masked steps are ignored: corrupt sample 2 of agent 0 at a masked step
    avail2 = jnp.ones((B, T)).at[0, 3].set(0.0)
    pos2 = pos.at[0, 2, 3].set(1e3)
    _, idx2 = choose_closest_to_gt(samples, pos2, gt, avail2)
    assert int(idx2[0]) == 2
