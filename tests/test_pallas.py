"""Pallas kernels vs jnp reference oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.ops.pallas_kernels import (
    disk_collision_penalty_pallas,
    disk_collision_penalty_ref,
    offroad_count_pallas,
    offroad_count_ref,
)

INTERPRET = jax.default_backend() != "tpu"


def test_offroad_count_matches_ref():
    rng = np.random.default_rng(0)
    B, P, H, W = 4, 52, 64, 64
    drivable = (rng.random((B, H, W)) > 0.4).astype(np.float32)
    pix = rng.integers(0, 64, (B, P, 2)).astype(np.int32)
    ref = np.asarray(offroad_count_ref(jnp.asarray(pix), jnp.asarray(drivable)))
    got = np.asarray(
        offroad_count_pallas(jnp.asarray(pix), jnp.asarray(drivable), interpret=INTERPRET)
    )
    np.testing.assert_allclose(got, ref)


def test_offroad_count_all_on_road():
    drivable = jnp.ones((2, 32, 32))
    pix = jnp.zeros((2, 10, 2), jnp.int32)
    got = np.asarray(offroad_count_pallas(pix, drivable, interpret=INTERPRET))
    np.testing.assert_allclose(got, 0.0)


def test_disk_collision_matches_ref():
    rng = np.random.default_rng(1)
    T, B, D = 8, 6, 4
    cent = rng.normal(0, 5, (T, B, D, 2)).astype(np.float32)
    rad = rng.uniform(0.8, 1.2, B).astype(np.float32)
    pen = rad[:, None] + rad[None, :] + 0.2
    mask = ~np.eye(B, dtype=bool)
    decay = (0.9 ** np.arange(T)).astype(np.float32)
    decay /= decay.sum()
    ref = np.asarray(
        disk_collision_penalty_ref(
            jnp.asarray(cent), jnp.asarray(pen), jnp.asarray(mask), jnp.asarray(decay)
        )
    )
    got = np.asarray(
        disk_collision_penalty_pallas(
            jnp.asarray(cent), jnp.asarray(pen), jnp.asarray(mask), jnp.asarray(decay),
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    assert ref.max() > 0  # the random scene does contain collisions


def test_disk_collision_no_overlap_zero():
    T, B, D = 4, 3, 2
    cent = np.zeros((T, B, D, 2), np.float32)
    cent[:, :, :, 0] += np.arange(B)[None, :, None] * 100.0  # far apart
    pen = np.full((B, B), 2.0, np.float32)
    mask = ~np.eye(B, dtype=bool)
    decay = np.full(T, 1.0 / T, np.float32)
    got = np.asarray(
        disk_collision_penalty_pallas(
            jnp.asarray(cent), jnp.asarray(pen), jnp.asarray(mask), jnp.asarray(decay),
            interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(got, 0.0)


def test_drivable_gather_pallas_matches_ref():
    """One-hot-matmul drivable gather == fancy-index reference, including
    the Q-padding path."""
    import numpy as np
    import jax.numpy as jnp
    from cld_tpu.ops.pallas_kernels import drivable_gather_pallas, drivable_gather_ref

    rng = np.random.default_rng(3)
    B, Q, H, W = 3, 777, 96, 96
    drv = jnp.asarray(rng.random((B, H, W)), jnp.float32)
    pix = jnp.asarray(
        np.stack([rng.integers(0, W, (B, Q)), rng.integers(0, H, (B, Q))], -1),
        jnp.int32,
    )
    ref = drivable_gather_ref(pix, drv)
    out = drivable_gather_pallas(pix, drv, interpret=True)
    # map values round to bf16 inside the kernel (exact for 0/1 masks,
    # sign-preserving in general — consumers threshold at <= 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=4e-3)
    # exact on binary drivable masks (the production input)
    drv01 = (drv > 0.5).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(drivable_gather_pallas(pix, drv01, interpret=True)),
        np.asarray(drivable_gather_ref(pix, drv01)), rtol=0)
    # int8 maps take the MXU int8 path (the MapCollisionLoss production
    # input: binarized drivable), also exact
    drv8 = (drv > 0.5).astype(jnp.int8)
    np.testing.assert_allclose(
        np.asarray(drivable_gather_pallas(pix, drv8, interpret=True)),
        np.asarray(drivable_gather_ref(pix, drv01)), rtol=0)


def test_drivable_bit_gather_pallas_matches_ref():
    """Bit-packed one-hot gather == binarized fancy-index reference, exact,
    incl. W not divisible by 8 and bytes with the high bit set."""
    import numpy as np
    import jax.numpy as jnp
    from cld_tpu.ops.pallas_kernels import (
        drivable_bit_gather_pallas,
        drivable_gather_ref,
        pack_drivable_bits,
    )

    rng = np.random.default_rng(4)
    for (B, Q, H, W) in [(3, 777, 96, 96), (2, 100, 60, 93)]:
        drv = jnp.asarray(rng.random((B, H, W)) - 0.3, jnp.float32)
        pix = jnp.asarray(
            np.stack([rng.integers(0, W, (B, Q)), rng.integers(0, H, (B, Q))], -1),
            jnp.int32,
        )
        want = (np.asarray(drivable_gather_ref(pix, drv)) > 0).astype(np.float32)
        got = np.asarray(drivable_bit_gather_pallas(pix, drv, interpret=True))
        np.testing.assert_array_equal(got, want)
        # the prepacked fast path (pack hoisted out of sampling scans)
        got_pre = np.asarray(drivable_bit_gather_pallas(
            pix, pack_drivable_bits(drv), interpret=True, prepacked=True))
        np.testing.assert_array_equal(got_pre, want)
    # packing round-trip: byte 255 (all on) survives the int8 reinterpret
    allon = jnp.ones((1, 8, 8), jnp.float32)
    assert int(pack_drivable_bits(allon)[0, 0, 0]) == -1  # 0xFF as int8


def test_rigid_min_and_bwd_pallas_match_ref():
    """VMEM-resident rigid map-collision kernels == jnp references
    (distances exact, argmin distance-consistent, analytic backward)."""
    import numpy as np
    import jax.numpy as jnp
    from cld_tpu.ops.pallas_kernels import (
        rigid_bwd_pallas, rigid_bwd_ref, rigid_min_pallas, rigid_min_ref)

    rng = np.random.default_rng(0)
    B, Q, P = 3, 13, 24
    pts_local = jnp.asarray(rng.normal(0, 2, (B, P, 2)), jnp.float32)
    d2 = jnp.sum((pts_local[:, :, None] - pts_local[:, None]) ** 2, -1)
    on = jnp.asarray(rng.random((B, Q, P)) > 0.4)
    d_ref, i_ref = rigid_min_ref(d2, on.astype(jnp.float32))
    d_pal, i_pal = rigid_min_pallas(d2, on, interpret=True)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_pal), rtol=1e-6)
    # ties may resolve differently through the symmetric flip; the selected
    # distance must agree
    bb = jnp.arange(B)[:, None, None]
    cols = jnp.arange(P)[None, None, :]
    np.testing.assert_allclose(
        np.asarray(d2[bb, i_ref, cols]), np.asarray(d2[bb, i_pal, cols]), rtol=1e-6)

    pts = jnp.asarray(rng.normal(0, 5, (B, Q, P, 2)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (B, Q, P)), jnp.float32)
    # in the loss, cotangents exist only at OFF-road columns (on-road
    # columns would hit the d=0 self-match and are always masked out)
    g = jnp.where(on, 0.0, g)
    np.testing.assert_allclose(
        np.asarray(rigid_bwd_ref(pts, i_pal, d_pal, g)),
        np.asarray(rigid_bwd_pallas(pts, i_pal, d_pal, g, interpret=True)),
        rtol=1e-4, atol=1e-5)


def test_rigid_min_fused_pallas_matches_ref():
    """1-D-grid fused rigid masked-min == jnp reference (distances exact,
    argmin tie-broken to the lowest live row like jnp.argmin), incl. a
    non-divisible B and an all-off-road column."""
    import numpy as np
    import jax.numpy as jnp
    from cld_tpu.ops.pallas_kernels import rigid_min_fused_pallas, rigid_min_ref

    rng = np.random.default_rng(1)
    for (B, Q, P) in [(3, 13, 24), (5, 7, 16)]:
        pts_local = jnp.asarray(rng.normal(0, 2, (B, P, 2)), jnp.float32)
        d2 = jnp.sum((pts_local[:, :, None] - pts_local[:, None]) ** 2, -1)
        on = np.asarray(rng.random((B, Q, P)) > 0.4)
        on[0, 0] = False  # all-off-road step: dist=sqrt(BIG), idx=0 both paths
        on = jnp.asarray(on)
        d_ref, i_ref = rigid_min_ref(d2, on.astype(jnp.float32))
        d_pal, i_pal = rigid_min_fused_pallas(d2, on, interpret=True)
        np.testing.assert_allclose(
            np.asarray(d_ref), np.asarray(d_pal), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pal))


def test_map_collision_rigid_pallas_matches_pairwise():
    """End-to-end: MapCollisionLoss(min_dist_impl='rigid_pallas') equals the
    pairwise path in values and gradients."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import GuidanceContext, MapCollisionLoss
    from cld_tpu.ops.geometry import world_from_agent_matrix

    B = 3
    batch = synthetic_batch(seed=0, batch_size=B, raster_size=64)
    ctx = GuidanceContext(
        drivable_map=batch.drivable_map, raster_from_agent=batch.raster_from_agent,
        extent=batch.extent, curr_speed=batch.curr_speed,
        world_from_agent=world_from_agent_matrix(jnp.zeros((B, 2)), jnp.zeros((B,))),
        scene_index=jnp.zeros((B,), jnp.int32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 8.0, (B, 2, 52, 6)), jnp.float32)
    x = x.at[..., 3].set(jnp.asarray(rng.uniform(-3, 3, (B, 2, 52)), jnp.float32))
    pair = MapCollisionLoss(min_dist_impl="pairwise")
    rp = MapCollisionLoss(min_dist_impl="rigid_pallas")
    np.testing.assert_allclose(np.asarray(pair(x, ctx)), np.asarray(rp(x, ctx)),
                               rtol=1e-4, atol=1e-5)
    g1 = jax.grad(lambda v: pair(v, ctx).sum())(x)
    g2 = jax.grad(lambda v: rp(v, ctx).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-5)


def test_map_collision_fused_and_bit_gather_match_pairwise():
    """End-to-end: the TPU fast path (bit-packed drivable gather +
    selectable fused masked-min forward) equals the pairwise jnp path in
    values and gradients (interpret mode on CPU)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import GuidanceContext, MapCollisionLoss
    from cld_tpu.ops.geometry import world_from_agent_matrix

    B = 3
    batch = synthetic_batch(seed=0, batch_size=B, raster_size=64)
    ctx = GuidanceContext(
        drivable_map=batch.drivable_map, raster_from_agent=batch.raster_from_agent,
        extent=batch.extent, curr_speed=batch.curr_speed,
        world_from_agent=world_from_agent_matrix(jnp.zeros((B, 2)), jnp.zeros((B,))),
        scene_index=jnp.zeros((B,), jnp.int32))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 8.0, (B, 2, 52, 6)), jnp.float32)
    x = x.at[..., 3].set(jnp.asarray(rng.uniform(-3, 3, (B, 2, 52)), jnp.float32))
    ref = MapCollisionLoss(min_dist_impl="pairwise")
    fast = MapCollisionLoss(gather_impl="pallas", min_fwd_impl="fused")
    np.testing.assert_allclose(np.asarray(ref(x, ctx)), np.asarray(fast(x, ctx)),
                               rtol=1e-4, atol=1e-5)
    g1 = jax.grad(lambda v: ref(v, ctx).sum())(x)
    g2 = jax.grad(lambda v: fast(v, ctx).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-5)


def test_map_collision_eqmin_matches_rigid_exactly():
    """min_fwd_impl='eqmin' (argmin-free forward, equality-recovered index
    in the backward) is BITWISE-identical to the default rigid path in
    values and gradients — including on the regular bbox grid, where exact
    distance ties between symmetric points exercise the lowest-tied-index
    rule."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import GuidanceContext, MapCollisionLoss
    from cld_tpu.ops.geometry import world_from_agent_matrix

    B = 3
    batch = synthetic_batch(seed=0, batch_size=B, raster_size=64)
    ctx = GuidanceContext(
        drivable_map=batch.drivable_map, raster_from_agent=batch.raster_from_agent,
        extent=batch.extent, curr_speed=batch.curr_speed,
        world_from_agent=world_from_agent_matrix(jnp.zeros((B, 2)), jnp.zeros((B,))),
        scene_index=jnp.zeros((B,), jnp.int32))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 8.0, (B, 2, 52, 6)), jnp.float32)
    x = x.at[..., 3].set(jnp.asarray(rng.uniform(-3, 3, (B, 2, 52)), jnp.float32))
    ref = MapCollisionLoss(min_dist_impl="rigid")
    eq = MapCollisionLoss(min_dist_impl="rigid", min_fwd_impl="eqmin")
    np.testing.assert_array_equal(np.asarray(ref(x, ctx)), np.asarray(eq(x, ctx)))
    g1 = jax.grad(lambda v: ref(v, ctx).sum())(x)
    g2 = jax.grad(lambda v: eq(v, ctx).sum())(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_map_collision_bf16_min_matches_rigid():
    """min_fwd_impl='bf16' (bfloat16 masked min + equality backward, f32
    assembly — the VPU-bound masked min is the guided step's hottest op and
    bf16 doubles its lanes) tracks the f32 rigid path within bf16 rounding:
    loss to ~1e-3 relative, gradient direction cosine > 0.999."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cld_tpu.data.synthetic import synthetic_batch
    from cld_tpu.guidance.losses import GuidanceContext, MapCollisionLoss
    from cld_tpu.ops.geometry import world_from_agent_matrix

    B = 3
    batch = synthetic_batch(seed=0, batch_size=B, raster_size=64)
    ctx = GuidanceContext(
        drivable_map=batch.drivable_map, raster_from_agent=batch.raster_from_agent,
        extent=batch.extent, curr_speed=batch.curr_speed,
        world_from_agent=world_from_agent_matrix(jnp.zeros((B, 2)), jnp.zeros((B,))),
        scene_index=jnp.zeros((B,), jnp.int32))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 8.0, (B, 2, 52, 6)), jnp.float32)
    x = x.at[..., 3].set(jnp.asarray(rng.uniform(-3, 3, (B, 2, 52)), jnp.float32))
    ref = MapCollisionLoss(min_dist_impl="rigid")
    b16 = MapCollisionLoss(min_dist_impl="rigid", min_fwd_impl="bf16")
    l_ref = np.asarray(ref(x, ctx))
    l_b16 = np.asarray(b16(x, ctx))
    np.testing.assert_allclose(l_b16, l_ref, rtol=2e-3, atol=1e-2)
    g1 = np.asarray(jax.grad(lambda v: ref(v, ctx).sum())(x))
    g2 = np.asarray(jax.grad(lambda v: b16(v, ctx).sum())(x))
    cos = float(
        np.dot(g1.ravel(), g2.ravel())
        / (np.linalg.norm(g1) * np.linalg.norm(g2) + 1e-12)
    )
    assert cos > 0.999, cos
    assert np.all(np.isfinite(g2))


def test_min_dist_rigid_unit_ties_split_evenly():
    """Unit-level: a hand-built tie (two onroad rows exactly equidistant
    from a column) SPLITS the gradient evenly among the tied rows — the
    reference's torch.amin backward (`guidance_loss.py:840`) and jnp.min
    AD both do; winner-take-all routing would push only one row."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cld_tpu.guidance.losses import _BIG_D2, _min_dist_rigid

    # P=3 points on a line: rows 0 and 2 are both distance 1 from column 1
    pts = jnp.asarray([[[[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]]])  # [1,1,3,2]
    d2_const = jnp.sum(
        (pts[:, 0, :, None] - pts[:, 0, None, :]) ** 2, -1
    )[:, None]
    onroad = jnp.asarray([[[True, False, True]]])  # column 1 is offroad

    def custom(p):
        # rebuild the pose-dependent cache from p so AD sees the same graph
        d2 = jnp.sum((p[:, 0, :, None] - p[:, 0, None, :]) ** 2, -1)[:, None]
        return _min_dist_rigid(p, jax.lax.stop_gradient(d2), onroad).sum()

    def plain_ad(p):
        # live rows vs detached columns through plain jnp ops — the
        # reference formulation the custom VJP must reproduce
        d2 = jnp.sum(
            (p[..., :, None, :] - jax.lax.stop_gradient(p)[..., None, :, :]) ** 2,
            -1,
        )
        d2 = jnp.where(onroad[..., :, None], d2, _BIG_D2)
        return jnp.sqrt(jnp.min(d2, axis=-2) + 1e-12).sum()

    v = _min_dist_rigid(pts, d2_const, onroad)
    assert np.isfinite(np.asarray(v)).all()
    g_custom = jax.grad(custom)(pts)
    g_ad = jax.grad(plain_ad)(pts)
    assert np.abs(np.asarray(g_ad)).sum() > 0
    # tied rows 0 and 2 both receive half the pull away from column 1
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_ad), rtol=1e-5, atol=1e-7
    )
    gx = np.asarray(g_custom)[0, 0, :, 0]
    np.testing.assert_allclose(gx[0], -gx[2], rtol=1e-5)
    assert abs(gx[0]) > 0
