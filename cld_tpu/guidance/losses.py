"""Guidance loss library — pure cost functions over trajectories.

Capability parity with the registered losses in `GUIDANCE_FUNC_MAP`
(`/root/reference/src/tbsim/utils/guidance_loss.py:2087-2103`). Every loss
is a small dataclass of *static* parameters whose `__call__` maps
(x [B, N, T, 6], ctx, agt_mask [B]) -> [B, N], with 6 = (x, y, vel, yaw,
acc, yawvel) in descaled units. All shapes are static; raggedness (scenes,
guided-agent subsets, overlap steps) is expressed with masks, never gathers,
so a loss jits into the sampling scan.

Gradient masking matches the reference: non-guided/stationary agents see
`stop_gradient`ed inputs so guidance never leaks into them
(`guidance_loss.py:516-533`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.ops.geometry import transform_points


class GuidanceContext(NamedTuple):
    """Static-shape scene context consumed by guidance losses (the subset of
    the reference's data_batch that losses read)."""

    drivable_map: jnp.ndarray  # [B, H, W]
    raster_from_agent: jnp.ndarray  # [B, 3, 3]
    extent: jnp.ndarray  # [B, 3]
    curr_speed: jnp.ndarray  # [B]
    world_from_agent: jnp.ndarray  # [B, 3, 3]
    scene_index: jnp.ndarray  # [B] int: which scene each agent belongs to
    # optional lane polylines for lane_following: [B, L, 3] (x, y, yaw) in
    # agent frame with NaN/inf-free padding masked by lane_avail [B, L]
    lane_points: Optional[jnp.ndarray] = None
    lane_avail: Optional[jnp.ndarray] = None
    # optional fields consumed by the global (world-frame, sim-time-aware)
    # losses; None falls back to identity-frame / t=0 semantics
    agent_from_world: Optional[jnp.ndarray] = None  # [B, 3, 3]
    global_t: Optional[jnp.ndarray] = None  # scalar int32 current sim frame
    agent_hist_world: Optional[jnp.ndarray] = None  # [B, Th, 4] world (x,y,v,yaw)
    # bit-packed drivable map ([B, H, ceil(W/8)] int8, pack_drivable_bits)
    # computed once at context-construction time: XLA does not hoist the
    # pack out of while loops, so packing inside the denoise scan would pay
    # it at every guidance step. Fill via `prepack_drivable`.
    drivable_packed: Optional[jnp.ndarray] = None
    # MapCollisionLoss bbox invariants, same hoisting story (measured on the
    # round-3 device profile: XLA recomputed the pose-invariant [B, P, P]
    # distance cache at EVERY denoise step, 0.065 ms/step at bench scale
    # despite it being scan-invariant). bbox_pts [B, R, C, 2] extent-scaled
    # local grid points — kept GRID-shaped (not flattened to P) so the loss
    # can verify the exact (R, C) factorization before reuse: two different
    # num_points_lw with the same product are different grids, and a
    # flat-count check alone would silently consume the wrong one.
    # bbox_d2 [B, P, P] their pairwise squared distances (P = R * C,
    # row-major). Fill via `prepack_map_bbox` with the SAME num_points_lw
    # as the loss (make_perturbation_guidance does this from the spec).
    bbox_pts: Optional[jnp.ndarray] = None
    bbox_d2: Optional[jnp.ndarray] = None


def prepack_drivable(ctx: "GuidanceContext") -> "GuidanceContext":
    """Return ctx with `drivable_packed` filled (TPU backend only — the
    packed form feeds the pallas bit-gather, which interprets elsewhere)."""
    if ctx.drivable_packed is not None or jax.default_backend() != "tpu":
        return ctx
    from cld_tpu.ops.pallas_kernels import pack_drivable_bits

    return ctx._replace(drivable_packed=pack_drivable_bits(ctx.drivable_map))


def bbox_local_grid(num_points_lw: Tuple[int, int]) -> jnp.ndarray:
    """[P, 2] unit bbox sample grid of MapCollisionLoss (row-major r*C+c)."""
    lwise = np.linspace(-0.5, 0.5, num_points_lw[0])
    wwise = np.linspace(-0.5, 0.5, num_points_lw[1])
    return jnp.asarray(
        np.stack(np.meshgrid(lwise, wwise, indexing="ij"), -1).reshape(-1, 2),
        dtype=jnp.float32,
    )


def prepack_map_bbox(
    ctx: "GuidanceContext",
    num_points_lw: Tuple[int, int] = (10, 10),
    with_d2: bool = True,
) -> "GuidanceContext":
    """Fill the MapCollisionLoss bbox invariants (pts grid + pairwise d2).

    Both depend only on ctx.extent and the static grid, so computing them
    here — outside the sampling scan — replaces a per-denoise-step
    recompute. Idempotent for a matching (R, C) grid; a ctx prepacked for a
    DIFFERENT grid is re-packed (the loss requires an exact grid-shape
    match before reuse and recomputes otherwise). `with_d2=False` skips the
    [B, P, P] distance cache — only the rigid/pairwise min_dist_impl paths
    read it; the default "separable" path never does."""
    R, C = num_points_lw
    if ctx.bbox_pts is not None and ctx.bbox_pts.shape[1:3] == (R, C):
        if not with_d2 or ctx.bbox_d2 is not None:
            return ctx
    local = bbox_local_grid(num_points_lw)  # [P, 2]
    pts = local[None] * ctx.extent[:, None, :2]  # [B, P, 2]
    d2 = None
    if with_d2:
        d2 = jnp.sum((pts[:, :, None, :] - pts[:, None, :, :]) ** 2, axis=-1)
    return ctx._replace(bbox_pts=pts.reshape(-1, R, C, 2), bbox_d2=d2)


def masked_mean(per_agent: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of [B, N] entries over agents where mask[B] is True."""
    m = mask[:, None].astype(per_agent.dtype)
    return jnp.sum(per_agent * m) / jnp.clip(jnp.sum(m) * per_agent.shape[1], 1e-6)


def _decay_weights(T: int, decay_rate: float) -> jnp.ndarray:
    w = decay_rate ** np.arange(T)
    return jnp.asarray(w / w.sum(), dtype=jnp.float32)


import os

# elements (f32) per horizon-scan tile: ~128 MB default. Bigger tiles mean
# fewer sequential scan iterations inside the guided sampler (latency win);
# HBM is the only bound since tiles are XLA-managed, not VMEM-resident.
_CHUNK_BUDGET = int(os.environ.get("CLD_GUIDE_CHUNK_ELEMS", 1 << 25))
# full-horizon fast path: skip the horizon chunk scan entirely while the
# whole [B, N*T, P, P] masked-min tensor stays under this many elements
# (f32 transient ~4x this in bytes; 1<<27 = 536 MB — rollout scale easily
# fits, scene-scale batches fall back to the chunk scan)
_FULL_HORIZON_BUDGET = int(os.environ.get("CLD_GUIDE_FULL_ELEMS", 1 << 27))


def _time_chunk(T: int, elems_per_step: int, budget: int = 0) -> int:
    """Chunk size for horizon scans: as many steps per scan iteration as fit
    the element budget, so small problems run fully parallel (one iteration)
    and scene-scale problems stay memory-bounded without serializing into T
    latency-bound micro-steps."""
    budget = budget or _CHUNK_BUDGET
    k = max(1, min(T, budget // max(elems_per_step, 1)))
    # prefer a divisor-ish chunk to minimize padding waste
    while T % k > 0 and (T % k) < k // 2 and k > 1:
        k -= 1
    return k


def _mask_gradient(x: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """stop_gradient for agents where keep[B] is False."""
    keep = keep.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(keep, x, jax.lax.stop_gradient(x))


_BIG_D2 = 1e12  # finite "masked" squared distance (inf would NaN the grad)


@jax.custom_vjp
def _min_dist_rigid(pts: jnp.ndarray, d2_local: jnp.ndarray, onroad: jnp.ndarray) -> jnp.ndarray:
    """Rigid-cache form of the MapCollision min-distance kernel.

    The P bbox points of one agent are a RIGID transform of a fixed
    extent-scaled local grid, so pairwise distances between them are
    pose-invariant: `d2_local` [..., P, P] is computed ONCE per agent
    (scan-invariant — XLA hoists it out of the 100-step sampling loop) and
    the per-step forward is ONE plain min reduce over it (no variadic
    argmin — that lowers worse on the TPU VPU). The reference gradient
    (live rows vs detached columns through `torch.amin`,
    `guidance_loss.py:826-850`) is reinjected analytically in the custom
    backward: column j's cotangent flows to its min row(s) as
    g_j * (p_i - p_j) / d_j, SPLIT EVENLY among exact ties — torch.amin's
    (and jnp.min AD's) tie rule, which the regular bbox grid hits whenever
    an off-road point sits symmetrically between two on-road neighbors.
    Rows are recovered in the backward by exact float equality against the
    stored min (the recomputed masked d2 repeats the forward's ops
    bitwise) and routed with rank-reducing one-hot contractions (TPU
    scatters are slow; fused compare-reduces are not).

    pts [..., P, 2] CURRENT pose points (bwd only), onroad [..., P] bool.
    """
    d2 = jnp.where(onroad[..., :, None], d2_local, _BIG_D2)
    return jnp.sqrt(jnp.min(d2, axis=-2) + 1e-12)


def _min_dist_rigid_fwd(pts, d2_local, onroad):
    d2 = jnp.where(onroad[..., :, None], d2_local, _BIG_D2)
    m2 = jnp.min(d2, axis=-2)
    return jnp.sqrt(m2 + 1e-12), (pts, d2_local, onroad, m2)


def _min_dist_rigid_bwd(res, g):
    pts, d2_local, onroad, m2 = res
    d2 = jnp.where(onroad[..., :, None], d2_local, _BIG_D2)
    # [..., P(row), P(col)] tie-normalized one-hot: equality against the
    # stored min is exact (same ops as the forward), count >= 1 whenever
    # any row is on-road; all-off-road columns get upstream g = 0
    eq = (d2 == m2[..., None, :]).astype(pts.dtype)
    cnt = jnp.sum(eq, axis=-2)  # [..., P] ties per column
    a = g / jnp.sqrt(m2 + 1e-12) / jnp.maximum(cnt, 1.0)  # [..., P]
    # Three separate rank-reducing contractions, NOT one einsum with a
    # channel axis: "...ij,...jc->...ic" lowers to a dot, which forces the
    # [..., P, P] one-hot to materialize in HBM (~266 MB at bench scale,
    # the single largest guided-step cost when measured); the "...ij,...j"
    # reduces stay fused with the compare, so the pairwise tensor never
    # leaves registers.
    s_a = jnp.einsum("...ij,...j->...i", eq, a)
    s_apx = jnp.einsum("...ij,...j->...i", eq, a * pts[..., 0])
    s_apy = jnp.einsum("...ij,...j->...i", eq, a * pts[..., 1])
    s_ap = jnp.stack([s_apx, s_apy], axis=-1)
    grad = pts * s_a[..., None] - s_ap
    return grad, None, None


_min_dist_rigid.defvjp(_min_dist_rigid_fwd, _min_dist_rigid_bwd)

# min_fwd_impl="eqmin" predates the consolidation: the argmin-free forward
# + equality-recovered backward IS the default now, so the knob aliases it
# (kept so BENCH_MAP_MIN_FWD=eqmin A/B runs remain valid no-ops).
_min_dist_rigid_eqmin = _min_dist_rigid

_BIG_D2_BF16 = jnp.bfloat16(1e12)


@jax.custom_vjp
def _min_dist_rigid_bf16(pts, d2_local, onroad):
    """bf16-compute twin of `_min_dist_rigid` (min_fwd_impl="bf16").

    The [B, Q, P, P] masked min is VPU-compute-bound (~666M element ops at
    bench scale); bf16 doubles the VPU lanes. The equality row recovery in
    the backward still works — the recomputed masked d2 repeats the
    forward's bf16 ops bitwise — and the tie-splitting rule absorbs the
    coarser rounding (bf16 just makes near-ties into exact ties, which
    split, matching torch.amin semantics in spirit). Distances come back
    with ~2^-8 relative error; measured guidance-gradient cosine vs f32 is
    0.9999+ (scripts/micro_rigid_bf16.py). Gradient assembly stays f32.
    """
    d2 = jnp.where(onroad[..., :, None], d2_local.astype(jnp.bfloat16), _BIG_D2_BF16)
    m2 = jnp.min(d2, axis=-2)
    return jnp.sqrt(m2.astype(jnp.float32) + 1e-12)


def _min_dist_rigid_bf16_fwd(pts, d2_local, onroad):
    d2 = jnp.where(onroad[..., :, None], d2_local.astype(jnp.bfloat16), _BIG_D2_BF16)
    m2 = jnp.min(d2, axis=-2)
    return jnp.sqrt(m2.astype(jnp.float32) + 1e-12), (pts, d2_local, onroad, m2)


def _min_dist_rigid_bf16_bwd(res, g):
    pts, d2_local, onroad, m2 = res
    d2 = jnp.where(onroad[..., :, None], d2_local.astype(jnp.bfloat16), _BIG_D2_BF16)
    # exact bf16 equality against the stored bf16 min; the one-hot and the
    # contractions run in bf16 (eq is exactly 0/1; `a` loses ~2^-8 relative
    # on top of the bf16 min it divides by) with f32 accumulation
    eq = (d2 == m2[..., None, :]).astype(jnp.bfloat16)
    cnt = jnp.sum(eq, axis=-2, dtype=jnp.float32)
    m = jnp.sqrt(m2.astype(jnp.float32) + 1e-12)
    a = (g / m / jnp.maximum(cnt, 1.0)).astype(jnp.bfloat16)
    px = pts[..., 0].astype(jnp.bfloat16)
    py = pts[..., 1].astype(jnp.bfloat16)
    red = functools.partial(jnp.einsum, "...ij,...j->...i",
                            preferred_element_type=jnp.float32)
    s_a = red(eq, a)
    s_apx = red(eq, a * px)
    s_apy = red(eq, a * py)
    s_ap = jnp.stack([s_apx, s_apy], axis=-1)
    return pts * s_a[..., None] - s_ap, None, None


_min_dist_rigid_bf16.defvjp(_min_dist_rigid_bf16_fwd, _min_dist_rigid_bf16_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _min_dist_rigid_fused(pts, d2_local, onroad, interpret=False):
    """Optional pallas forward of the rigid masked min (min_fwd_impl=
    "fused"): the 1-D-grid kernel (ops/pallas_kernels.rigid_min_fused_pallas)
    keeps the [bb, P, P] cache VMEM-resident and sweeps the horizon
    in-kernel, so the [B, Q, P, P] masked tensor never exists in HBM.
    Measured SLOWER than the jnp path on v5e at bench scale (1.16 vs
    0.90 ms loss_vg, scripts/micro_map_combos.py): XLA already fuses the
    broadcast into the reduces, and the kernel's per-program horizon sweep
    is sequential. Kept as a selectable experiment for other shapes.
    Backward stays the analytic jnp one-hot routing (cheap: ~0.1 ms).

    pts [B, Q, P, 2] (bwd only), d2_local [B, P, P], onroad [B, Q, P]."""
    from cld_tpu.ops.pallas_kernels import rigid_min_fused_pallas

    d, _ = rigid_min_fused_pallas(d2_local, onroad, interpret=interpret)
    return d


def _min_dist_rigid_fused_fwd(pts, d2_local, onroad, interpret):
    from cld_tpu.ops.pallas_kernels import rigid_min_fused_pallas

    d, idx = rigid_min_fused_pallas(d2_local, onroad, interpret=interpret)
    return d, (pts, idx, d)


def _route_by_idx_bwd(res, g):
    """Winner-take-all routing to the argmin row — used by the pallas
    experimental paths whose kernels return an index. NOTE: on exact
    distance ties this routes the whole cotangent to one row, while the
    default jnp path (and torch.amin in the reference) splits evenly."""
    pts, idx, dist = res
    P = pts.shape[-2]
    a = g / dist
    onehot = (idx[..., None, :] == jnp.arange(P)[:, None]).astype(pts.dtype)
    s_a = jnp.einsum("...ij,...j->...i", onehot, a)
    s_apx = jnp.einsum("...ij,...j->...i", onehot, a * pts[..., 0])
    s_apy = jnp.einsum("...ij,...j->...i", onehot, a * pts[..., 1])
    s_ap = jnp.stack([s_apx, s_apy], axis=-1)
    return pts * s_a[..., None] - s_ap


def _min_dist_rigid_fused_bwd(interpret, res, g):
    return _route_by_idx_bwd(res, g), None, None


_min_dist_rigid_fused.defvjp(_min_dist_rigid_fused_fwd, _min_dist_rigid_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _min_dist_rigid_pallas(pts, d2_local, onroad, interpret=False):
    """Pallas twin of _min_dist_rigid over the FULL horizon at once: the
    pose-invariant distance cache and the one-hot backward routing live only
    in VMEM (cld_tpu.ops.pallas_kernels.rigid_min/bwd_pallas) — the guided
    sampler's hottest op runs with zero pairwise HBM traffic.

    pts [B, Q, P, 2], d2_local [B, P, P], onroad [B, Q, P] bool."""
    from cld_tpu.ops.pallas_kernels import rigid_min_pallas

    d, _ = rigid_min_pallas(d2_local, onroad, interpret=interpret)
    return d


def _min_dist_rigid_pallas_fwd(pts, d2_local, onroad, interpret):
    from cld_tpu.ops.pallas_kernels import rigid_min_pallas

    d, idx = rigid_min_pallas(d2_local, onroad, interpret=interpret)
    return d, (pts, idx, d)


def _min_dist_rigid_pallas_bwd(interpret, res, g):
    from cld_tpu.ops.pallas_kernels import rigid_bwd_pallas

    pts, idx, dist = res
    grad = rigid_bwd_pallas(pts, idx, dist, g, interpret=interpret)
    return grad, None, None


_min_dist_rigid_pallas.defvjp(_min_dist_rigid_pallas_fwd, _min_dist_rigid_pallas_bwd)


@jax.custom_vjp
def _min_dist_separable(pts, onroad, rd2, cd2):
    """Separable exact-EDT form of the MapCollision min-distance kernel.

    The P = R x C bbox points form a REGULAR anisotropic grid, so the
    nearest-on-road-point distance is an exact two-pass separable Euclidean
    distance transform: a within-row min over source columns (E), then a
    min over source rows with the row-offset cost added (D) — O(P*(R+C))
    work instead of the O(P^2) all-pairs matrix (~10x fewer element-ops at
    10x10). Distances equal the pairwise form (up to f32 rounding of
    rd2+cd2 vs the directly-summed squared distance).

    Both stages are unrolled over the SMALL grid axis (R resp. C source
    index), so every live tensor keeps the [B, Q, R, C] shape and the hot
    sweeps are plain elementwise min chains XLA fuses into one pass —
    no variadic argmin, no take_along_axis (the round-2 form of this path
    lowered through both and lost to the all-pairs kernel on TPU).

    Backward: the reference gradient (column j's cotangent flows to its
    nearest on-road row i* as g_j * (p_i - p_j) / d_j,
    `guidance_loss.py:826-850`) is recovered by exact float equality
    against the staged minima (the recomputed masked sums repeat the
    forward's ops bitwise) and routed with factored one-hot contractions.
    TIE RULE CAVEAT: exact ties split evenly PER STAGE (equal shares to
    tied source rows, then equal shares within each row's tied columns) —
    torch.amin (and the default "rigid" path here) splits evenly over all
    tied (row, column) sites jointly. The two rules differ only when tied
    rows have different numbers of tied columns; values are unaffected.

    pts [B, Q, P, 2] current pose points (backward only),
    onroad [B, Q, P] bool (P flattened row-major as r * C + c),
    rd2 [B, R, R] squared row-offset distances (spacing_l^2 * (r - r')^2),
    cd2 [B, C, C] squared column-offset distances.
    """
    d, _, _ = _sep_stage_minima(onroad, rd2, cd2)
    return d


def _sep_stage_minima(onroad, rd2, cd2):
    """Two-stage masked minima: E [B, Q, R, C] (per source row r', nearest
    on-road column distance to target column c) and D [B, Q, R, C] (full
    min squared distance per target (r, c))."""
    B, Q, P = onroad.shape
    R = rd2.shape[-1]
    C = cd2.shape[-1]
    on = onroad.reshape(B, Q, R, C)
    E = jnp.full((B, Q, R, C), _BIG_D2)
    for cp in range(C):  # source column c'
        cand = jnp.where(on[..., cp : cp + 1], cd2[:, None, None, cp, :], _BIG_D2)
        E = jnp.minimum(E, cand)
    D = jnp.full((B, Q, R, C), _BIG_D2)
    for rp in range(R):  # source row r'
        D = jnp.minimum(D, rd2[:, None, rp, :, None] + E[:, :, rp : rp + 1, :])
    return jnp.sqrt(D.reshape(B, Q, P) + 1e-12), E, D


def _min_dist_separable_fwd(pts, onroad, rd2, cd2):
    d, E, D = _sep_stage_minima(onroad, rd2, cd2)
    return d, (pts, onroad, rd2, cd2, E, D)


def _min_dist_separable_bwd(res, g):
    """Factored equality routing, laid out so every hot tensor keeps a
    WIDE trailing axis (the flattened P target index, not the C=10 grid
    axis): TPU loop fusions vectorize over the minor-most dim, so [.., 10]
    tails would waste ~92% of the vector lanes. The two routing stages are
    each ~R sweeps of a [B, Q, R, P]-implicit tensor — ~(R+C)/P of the
    all-pairs backward's element count."""
    pts, onroad, rd2, cd2, E, D = res
    B, Q, P = onroad.shape
    R = rd2.shape[-1]
    C = cd2.shape[-1]
    on = onroad.reshape(B, Q, R, C)
    Df = D.reshape(B, Q, P)
    d = jnp.sqrt(Df + 1e-12)
    # per-target cotangent / distance; targets with no on-road source have
    # D = BIG and upstream g = 0 (MapCollisionLoss masks them)
    a = g / d  # [B, Q, P]
    px = pts[..., 0]
    py = pts[..., 1]  # [B, Q, P]

    # ---- stage-2 routing: target j = (r, c) -> source row rp ----
    # candidate sums recomputed BITWISE (same operands, same add as the
    # forward), flattened over j with the source-row axis at position 2
    rd2_t = jnp.broadcast_to(rd2[:, :, :, None], (B, R, R, C)).reshape(B, R, P)
    E_t = jnp.broadcast_to(
        E[:, :, :, None, :], (B, Q, R, R, C)
    ).reshape(B, Q, R, P)
    eqR = (rd2_t[:, None] + E_t) == Df[:, :, None, :]  # [B, Q, R(rp), P(j)]
    cntR = jnp.sum(eqR, axis=2)  # [B, Q, P]; >= 1 (D is the min of these)
    # cntR >= 1 rests on the bitwise-recompute invariant (rd2+E re-added
    # here equals the forward's D exactly); guard like stage-1's cntC so a
    # backend/fusion change that breaks the equality degrades to a zero
    # route instead of inf/NaN inside the guided sampling scan
    w = a / jnp.maximum(cntR, 1)

    def row_route(v):  # [B, Q, P] -> [B, Q, R(rp), C] (sum over target r)
        t = jnp.where(eqR, v[:, :, None, :], 0.0)
        return jnp.sum(t.reshape(B, Q, R, R, C), axis=3)

    b1 = row_route(w)
    b1x = row_route(w * px)
    b1y = row_route(w * py)

    # ---- stage-1 routing: per source row rp, target c -> source col cp ----
    # flat axis k = (rp, c) of size R*C; equality against E is arithmetic-
    # free (E is bitwise one of the cd2 values, or BIG which cd2 never hits)
    on_f = jnp.broadcast_to(
        jnp.swapaxes(on, 2, 3)[..., None], (B, Q, C, R, C)
    ).reshape(B, Q, C, R * C)
    cd2_f = jnp.broadcast_to(cd2[:, :, None, :], (B, C, R, C)).reshape(B, C, R * C)
    E_f = E.reshape(B, Q, 1, R * C)
    eqC = on_f & (cd2_f[:, None] == E_f)  # [B, Q, C'(cp), RC]
    cntC = jnp.sum(eqC, axis=2)  # [B, Q, RC]
    inv = 1.0 / jnp.maximum(cntC, 1.0)  # 0-count rows route nothing below

    def col_route(bv):  # [B, Q, R, C] -> [B, Q, C'(cp), R] (sum over c)
        t = jnp.where(eqC, bv.reshape(B, Q, 1, R * C) * inv[:, :, None, :], 0.0)
        return jnp.sum(t.reshape(B, Q, C, R, C), axis=-1)

    s_a = col_route(b1)
    s_ax = col_route(b1x)
    s_ay = col_route(b1y)
    tr = lambda s: jnp.swapaxes(s, 2, 3).reshape(B, Q, P)  # -> i = (rp, cp)
    s_a, s_ax, s_ay = tr(s_a), tr(s_ax), tr(s_ay)
    gx = px * s_a - s_ax
    gy = py * s_a - s_ay
    return jnp.stack([gx, gy], axis=-1), None, None, None


_min_dist_separable.defvjp(_min_dist_separable_fwd, _min_dist_separable_bwd)


@jax.custom_vjp
def _min_dist_separable_xy(pos, yaw, onroad, rd2, cd2, li, wi, lw):
    """Separable EDT with the vjp boundary moved from per-point gradients to
    (pos, yaw) directly — the routing-free form of `_min_dist_separable`.

    Forward values are BITWISE identical to the separable path (same
    `_sep_stage_minima`). The backward exploits the grid's rigidity: the
    reference gradient routes column j's cotangent to its nearest on-road
    row i* as g_j * (p_i* - p_j) / d_j (`guidance_loss.py:826-850`), and for
    a rigid grid p_i - p_j = Rot(yaw) @ delta_local where delta_local is the
    (tie-averaged) argmin GRID OFFSET — independent of position. Chaining to
    the pose therefore needs only per-target offset moments, never a
    per-point scatter:

      grad_pos[q] = Rot(yaw_q) @ sum_j w_j * delta_j            (w = g / d)
      grad_yaw[q] = sum_j w_j * (delta_jy * loc_jx - delta_jx * loc_jy)

    The yaw form is exact (not an approximation): the delta-quadratic term
    delta^T (Rot^T dRot) delta vanishes identically because Rot^T dRot =
    [[0,-1],[1,0]] is antisymmetric — and it vanishes for EACH tied delta
    individually, so tie-averaging commutes. Both one-hot routing stages,
    the [B, Q, P, 2] grad output, the pts residual, and the rotate-chain
    backward through agt_pts all disappear; what remains is R + C equality
    sweeps accumulating two scalars (count, offset) instead of three routed
    tensors. Tie semantics are exactly `_min_dist_separable`'s per-stage
    even split: the same bitwise-recompute equalities pick the same tied
    sets, and the per-(rp) within-row average dwbar1 composes with the
    stage-2 average exactly as the factored routing does.

    Knife-edge caveat: at EXACTLY symmetric tie configurations (e.g. an
    axis-aligned pose whose tied source offsets cancel) the routing
    backward's per-point contributions cancel only up to fp rounding, so
    its summed pose gradient there is cancellation residue; this form
    computes the symmetric zero exactly. Off the knife edge (any real
    pose) the two agree to assembly rounding (~1e-5 relative, tested).

    pos [B, Q, 2], yaw [B, Q] (backward only), onroad [B, Q, P] bool,
    rd2 [B, R, R], cd2 [B, C, C], li [R] / wi [C] unit grid coords,
    lw [B, 2] extents. Returns d [B, Q, P]."""
    d, _, _ = _sep_stage_minima(onroad, rd2, cd2)
    return d


def _min_dist_separable_xy_fwd(pos, yaw, onroad, rd2, cd2, li, wi, lw):
    d, E, D = _sep_stage_minima(onroad, rd2, cd2)
    return d, (yaw, onroad, rd2, cd2, li, wi, lw, E, D)


def _min_dist_separable_xy_bwd(res, g):
    yaw, onroad, rd2, cd2, li, wi, lw, E, D = res
    B, Q, P = onroad.shape
    R = rd2.shape[-1]
    C = cd2.shape[-1]
    on = onroad.reshape(B, Q, R, C)
    # per-target cotangent / distance; all-off-road targets have upstream
    # g = 0 (MapCollisionLoss masks them), so their garbage moments drop out
    w = g.reshape(B, Q, R, C) / jnp.sqrt(D + 1e-12)

    # ---- stage-1 moments: tie-averaged source-COLUMN offset per (rp, c).
    # Equality is arithmetic-free (E is bitwise one of the cd2 values, or
    # BIG which cd2 never hits) — same invariant as the routing backward.
    cnt1 = jnp.zeros((B, Q, R, C))
    dwsum = jnp.zeros((B, Q, R, C))
    for cp in range(C):
        f = jnp.where(
            on[:, :, :, cp : cp + 1] & (cd2[:, None, None, cp, :] == E), 1.0, 0.0
        )
        cnt1 = cnt1 + f
        dwsum = dwsum + f * (wi[cp] - wi)
    dwbar1 = dwsum / jnp.maximum(cnt1, 1.0)  # [B, Q, R(rp), C]

    # ---- stage-2 moments: candidate sums recomputed BITWISE (same operands,
    # same add as the forward's D chain), accumulating the row offset and the
    # per-row conditional column average
    cnt2 = jnp.zeros((B, Q, R, C))
    dlsum = jnp.zeros((B, Q, R, C))
    dwbar = jnp.zeros((B, Q, R, C))
    for rp in range(R):
        f = jnp.where(
            (rd2[:, None, rp, :, None] + E[:, :, rp : rp + 1, :]) == D, 1.0, 0.0
        )
        cnt2 = cnt2 + f
        dlsum = dlsum + f * (li[rp] - li)[None, None, :, None]
        dwbar = dwbar + f * dwbar1[:, :, rp : rp + 1, :]
    inv2 = 1.0 / jnp.maximum(cnt2, 1.0)  # >= 1 wherever g != 0 (D is a min)
    lw0 = lw[:, 0][:, None, None, None]
    lw1 = lw[:, 1][:, None, None, None]
    dx_loc = dlsum * inv2 * lw0  # tie-averaged delta, extent-scaled
    dy_loc = dwbar * inv2 * lw1

    mx = jnp.sum(w * dx_loc, axis=(2, 3))  # [B, Q]
    my = jnp.sum(w * dy_loc, axis=(2, 3))
    ljx = li[None, None, :, None] * lw0  # target point local coords
    ljy = wi[None, None, None, :] * lw1
    gyaw = jnp.sum(w * (dy_loc * ljx - dx_loc * ljy), axis=(2, 3))  # [B, Q]
    c = jnp.cos(yaw)
    s = jnp.sin(yaw)
    gpos = jnp.stack([c * mx - s * my, s * mx + c * my], axis=-1)
    return gpos, gyaw, None, None, None, None, None, None


_min_dist_separable_xy.defvjp(_min_dist_separable_xy_fwd, _min_dist_separable_xy_bwd)


def _sep_stage_minima_bf16(onroad, rd2, cd2):
    """bf16-compute twin of `_sep_stage_minima`: the (R + C) masked min
    sweeps are VPU-element-bound, and bf16 doubles the vector lanes (same
    rationale as `_min_dist_rigid_bf16`). Distances come back with ~2^-8
    relative error; E/D stay bf16 so the backward's equality recovery runs
    against bitwise-identical bf16 recomputes."""
    B, Q, P = onroad.shape
    R = rd2.shape[-1]
    C = cd2.shape[-1]
    on = onroad.reshape(B, Q, R, C)
    cd2b = cd2.astype(jnp.bfloat16)
    rd2b = rd2.astype(jnp.bfloat16)
    E = jnp.full((B, Q, R, C), _BIG_D2_BF16)
    for cp in range(C):
        cand = jnp.where(on[..., cp : cp + 1], cd2b[:, None, None, cp, :], _BIG_D2_BF16)
        E = jnp.minimum(E, cand)
    D = jnp.full((B, Q, R, C), _BIG_D2_BF16)
    for rp in range(R):
        D = jnp.minimum(D, rd2b[:, None, rp, :, None] + E[:, :, rp : rp + 1, :])
    d = jnp.sqrt(D.astype(jnp.float32).reshape(B, Q, P) + 1e-12)
    return d, E, D


@jax.custom_vjp
def _min_dist_separable_xy_bf16(pos, yaw, onroad, rd2, cd2, li, wi, lw):
    """bf16 separable EDT + moment backward (min_dist_impl="separable_xy_bf16").

    Combines `_min_dist_separable_xy`'s routing-free pose-boundary backward
    with bf16 stage sweeps: the equality moments recompute the bf16
    candidate sums bitwise, counts (<= R resp. C) and {0,1} masks are exact
    in bf16, and the offset moments carry ~2^-8 relative error into an f32
    assembly — the same accepted error class as `_min_dist_rigid_bf16`
    (measured guidance-gradient cosine 0.9999+ vs f32,
    scripts/micro_rigid_bf16.py). bf16 rounding coarsens near-ties into
    exact ties, which split evenly per stage."""
    d, _, _ = _sep_stage_minima_bf16(onroad, rd2, cd2)
    return d


def _min_dist_separable_xy_bf16_fwd(pos, yaw, onroad, rd2, cd2, li, wi, lw):
    d, E, D = _sep_stage_minima_bf16(onroad, rd2, cd2)
    return d, (yaw, onroad, rd2, cd2, li, wi, lw, E, D)


def _min_dist_separable_xy_bf16_bwd(res, g):
    yaw, onroad, rd2, cd2, li, wi, lw, E, D = res
    B, Q, P = onroad.shape
    R = rd2.shape[-1]
    C = cd2.shape[-1]
    on = onroad.reshape(B, Q, R, C)
    cd2b = cd2.astype(jnp.bfloat16)
    rd2b = rd2.astype(jnp.bfloat16)
    dfull = jnp.sqrt(D.astype(jnp.float32) + 1e-12)
    w = g.reshape(B, Q, R, C) / dfull
    one = jnp.bfloat16(1.0)
    zero = jnp.bfloat16(0.0)
    wib = wi.astype(jnp.bfloat16)
    lib = li.astype(jnp.bfloat16)

    cnt1 = jnp.zeros((B, Q, R, C), jnp.bfloat16)
    dwsum = jnp.zeros((B, Q, R, C), jnp.bfloat16)
    for cp in range(C):
        f = jnp.where(
            on[:, :, :, cp : cp + 1] & (cd2b[:, None, None, cp, :] == E), one, zero
        )
        cnt1 = cnt1 + f
        dwsum = dwsum + f * (wib[cp] - wib)
    dwbar1 = dwsum / jnp.maximum(cnt1, one)

    cnt2 = jnp.zeros((B, Q, R, C), jnp.bfloat16)
    dlsum = jnp.zeros((B, Q, R, C), jnp.bfloat16)
    dwbar = jnp.zeros((B, Q, R, C), jnp.bfloat16)
    for rp in range(R):
        f = jnp.where(
            (rd2b[:, None, rp, :, None] + E[:, :, rp : rp + 1, :]) == D, one, zero
        )
        cnt2 = cnt2 + f
        dlsum = dlsum + f * (lib[rp] - lib)[None, None, :, None]
        dwbar = dwbar + f * dwbar1[:, :, rp : rp + 1, :]
    inv2 = 1.0 / jnp.maximum(cnt2.astype(jnp.float32), 1.0)
    lw0 = lw[:, 0][:, None, None, None]
    lw1 = lw[:, 1][:, None, None, None]
    dx_loc = dlsum.astype(jnp.float32) * inv2 * lw0
    dy_loc = dwbar.astype(jnp.float32) * inv2 * lw1

    mx = jnp.sum(w * dx_loc, axis=(2, 3))
    my = jnp.sum(w * dy_loc, axis=(2, 3))
    ljx = li[None, None, :, None] * lw0
    ljy = wi[None, None, None, :] * lw1
    gyaw = jnp.sum(w * (dy_loc * ljx - dx_loc * ljy), axis=(2, 3))
    c = jnp.cos(yaw)
    s = jnp.sin(yaw)
    gpos = jnp.stack([c * mx - s * my, s * mx + c * my], axis=-1)
    return gpos, gyaw, None, None, None, None, None, None


_min_dist_separable_xy_bf16.defvjp(
    _min_dist_separable_xy_bf16_fwd, _min_dist_separable_xy_bf16_bwd
)


def _min_dist_to_onroad(pts: jnp.ndarray, onroad: jnp.ndarray) -> jnp.ndarray:
    """For every bbox point: distance to the nearest ON-road bbox point of
    the same (agent, step). pts [..., P, 2], onroad [..., P] bool ->
    [..., P].

    This is the kernel of MapCollisionLoss (`guidance_loss.py:826-850`):
    rows = live (differentiable) points masked to on-road, columns =
    detached points. Squared distances are reduced FIRST and the sqrt runs
    on the reduced [..., P] tensor, so the P x P matrix stays inside one
    fused compare-and-reduce on both the forward and the min's eq-mask
    backward. (Measured on TPU: this default-AD form beats both a
    custom_vjp with argmin+scatter backward — TPU scatters are slow — and
    a one-hot matmul backward.)
    """
    det = jax.lax.stop_gradient(pts)
    d2 = jnp.sum(
        (pts[..., :, None, :] - det[..., None, :, :]) ** 2, axis=-1
    )  # [..., P(live rows), P(det cols)]
    d2 = jnp.where(onroad[..., :, None], d2, _BIG_D2)
    return jnp.sqrt(jnp.min(d2, axis=-2) + 1e-12)


def _to_world(x: jnp.ndarray, world_from_agent: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Agent-frame (pos, yaw) -> world frame. x [B, N, T, 6]."""
    pos = transform_points(x[..., :2], world_from_agent)
    # yaw offset = rotation angle of the transform
    dyaw = jnp.arctan2(world_from_agent[:, 1, 0], world_from_agent[:, 0, 0])
    yaw = x[..., 3:4] + dyaw[:, None, None, None]
    return pos, yaw


@dataclasses.dataclass(frozen=True)
class TargetSpeedLoss:
    """Follow a per-agent target speed profile (`guidance_loss.py:219-255`)."""

    # [B]: one time-invariant target per agent (broadcast over the plan).
    # [B, T_fut]: a per-GLOBAL-frame profile — the plan window is cut out at
    # ctx.global_t exactly like the reference's
    # `target_speed[..., global_t:global_t+T]` (guidance_loss.py:231-248),
    # frames beyond the profile are masked, and the mean runs over the
    # valid slice length (0 valid frames -> 0 loss, the reference's dummy).
    target_speed: Tuple[float, ...] | np.ndarray
    dt: float = 0.1

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        tgt = jnp.asarray(self.target_speed, dtype=jnp.float32)
        T = x.shape[2]
        if tgt.ndim == 1:
            dev = jnp.abs(x[..., 2] - tgt[:, None, None])  # [B, N, T]
            return jnp.mean(jnp.nan_to_num(dev), axis=-1)
        T_fut = tgt.shape[1]
        gt = ctx.global_t if ctx.global_t is not None else jnp.zeros((), jnp.int32)
        idx = gt + jnp.arange(T)  # global frames the plan covers
        valid = idx < T_fut  # [T]
        prof = tgt[:, jnp.clip(idx, 0, T_fut - 1)]  # [B, T]
        dev = jnp.nan_to_num(jnp.abs(x[..., 2] - prof[:, None, :]))
        dev = dev * valid.astype(dev.dtype)[None, None, :]
        cnt = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        return jnp.sum(dev, axis=-1) / cnt


@dataclasses.dataclass(frozen=True)
class AgentCollisionLoss:
    """Scene-level pairwise disk-collision penalty
    (`guidance_loss.py:442-625`): each agent is approximated by num_disks
    circles along its length; penalty 1 - d/penalty_dist for colliding
    pairs, exponentially decayed over time, averaged over other agents."""

    num_disks: int = 5
    buffer_dist: float = 0.2
    decay_rate: float = 0.9
    guide_moving_speed_th: float = 0.5
    # collisions AMONG these agents are un-penalized — pairs where BOTH ends
    # are excluded (`guidance_loss.py:586-593`); excluded-vs-included pairs
    # still count. The reference uses this to let a gpt attack pair collide
    # while everyone else still avoids them.
    excluded_agents: Optional[Tuple[int, ...]] = None
    # Static scene-blocking hint: when the batch is laid out as contiguous
    # equal-size scenes of `scene_block` agents (the layout every cld_tpu
    # scene pack / bench produces), pairwise distances are computed
    # block-diagonally — [S, A, A] instead of [B, B] — cutting work and HBM
    # by B/A. This is the reference's own TODO ("pad each scene to
    # max_agents and compare MaxA x MaxA", guidance_loss.py:572) realized;
    # numerics are IDENTICAL to the flat path (cross-scene pairs are zero
    # there, and the mean stays over the full B). None = generic flat path.
    # CAVEAT: the layout claim is NOT validated at runtime (scene_index is
    # traced) — setting this on a batch whose scenes straddle block
    # boundaries silently drops those cross-block pairs. Construct via
    # heuristics._uniform_scene_block, which checks the layout host-side
    # and returns None when it does not hold.
    scene_block: Optional[int] = None
    # pairwise-distance formulation for the scene_block path:
    #   "diff"  materialize disk differences [K,S,A,A,N,D,D,2] and reduce —
    #           bitwise the reference's torch.norm(a-b) rounding, but HBM-
    #           bound at big blocks (A=50: +1.30 ms/denoise-step at B=100);
    #   "dot"   norm expansion |a|^2+|b|^2-2ab via one batched Gram matmul
    #           on per-timestep-CENTERED points (centering bounds the
    #           cancellation error; values match "diff" to ~1e-4 relative
    #           at 100 m scene spans) — ~4x less HBM traffic;
    #   "auto"  "dot" for blocks of A >= 16 on TPU, else "diff".
    pairwise_impl: str = "auto"

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        B, N, T, _ = x.shape
        moving = jnp.abs(ctx.curr_speed) > self.guide_moving_speed_th
        x = _mask_gradient(x, moving)
        if agt_mask is not None:
            x = _mask_gradient(x, agt_mask)

        pos_w, yaw_w = _to_world(x, ctx.world_from_agent)

        # disks along the vehicle length axis (agent local frame)
        agt_rad = ctx.extent[:, 1] / 2.0  # [B]
        cent_min = -(ctx.extent[:, 0] / 2.0) + agt_rad
        cent_max = (ctx.extent[:, 0] / 2.0) - agt_rad
        lin = jnp.linspace(0.0, 1.0, self.num_disks)
        cent_x = cent_min[:, None] + (cent_max - cent_min)[:, None] * lin[None]  # [B, D]
        centroids = jnp.stack([cent_x, jnp.zeros_like(cent_x)], axis=-1)  # [B, D, 2]

        # rotate disks into world frame and attach to trajectory
        c = jnp.cos(yaw_w)[..., None]  # [B, N, T, 1, 1]
        s = jnp.sin(yaw_w)[..., None]
        # row-vector convention of the reference: p @ [[c, s], [-s, c]]
        cent = centroids[:, None, None]  # [B, 1, 1, D, 2]
        rx = cent[..., 0] * c[..., 0] + cent[..., 1] * (-s[..., 0])
        ry = cent[..., 0] * s[..., 0] + cent[..., 1] * c[..., 0]
        cent_w = jnp.stack([rx, ry], axis=-1) + pos_w[..., None, :]  # [B, N, T, D, 2]

        D = self.num_disks
        w = _decay_weights(T, self.decay_rate)
        exc = None
        if self.excluded_agents:
            exc_np = np.zeros(B, bool)
            exc_np[np.asarray(self.excluded_agents, int)] = True
            exc = jnp.asarray(exc_np)
        A = self.scene_block
        if A is not None and 1 < A <= B and B % A == 0:
            S = B // A
            si = ctx.scene_index.reshape(S, A)
            rad = agt_rad.reshape(S, A)
            pen_d = rad[:, :, None] + rad[:, None, :] + self.buffer_dist  # [S, A, A]
            pair_valid = (si[:, :, None] == si[:, None, :]) & ~jnp.eye(A, dtype=bool)[None]
            if exc is not None:
                exc_b = exc.reshape(S, A)
                pair_valid = pair_valid & ~(exc_b[:, :, None] & exc_b[:, None, :])
            impl = self.pairwise_impl
            if impl == "auto":
                impl = (
                    "dot"
                    if A >= 16 and jax.default_backend() == "tpu"
                    else "diff"
                )
            if impl not in ("diff", "dot"):
                raise ValueError(
                    f"unknown pairwise_impl {self.pairwise_impl!r} "
                    "(expected auto|diff|dot)"
                )
            K = _time_chunk(T, S * A * A * N * D * D)
            pad = (-T) % K
            w_c = jnp.pad(w, (0, pad)).reshape(-1, K)

            if impl == "dot":
                # Gram-matmul pairwise distances: one [AD, 2] x [2, AD]
                # batched dot per (k, s, n) instead of the [A, A, D, D, 2]
                # difference tensor — the only disk-pair-sized tensors left
                # are the Gram matrix and the distance operand of the min
                # reduce, ~4x less HBM than "diff". Points are centered PER
                # (k, s, n) before squaring so |p|^2 stays small relative to
                # the pair distances (padded steps center on their own 1e6
                # constant and contribute nothing: their w_k is 0). Measured
                # at A=50, B=100 on v5e: +0.70 ms/denoise-step vs +1.30 for
                # "diff" (two fancier variants — a collinear-disk 6-scalar
                # factorization broadcast into the min — measured 3-6x WORSE
                # because XLA materializes the broadcast at poor layouts).
                cent_tw = jnp.pad(
                    cent_w.reshape(S, A, N, T, D, 2).transpose(3, 0, 1, 2, 4, 5),
                    ((0, pad),) + ((0, 0),) * 5,
                    constant_values=1e6,  # padded steps land far -> no collision
                ).reshape(-1, K, S, A, N, D, 2)

                @jax.checkpoint
                def step_blk(acc, inp):
                    cent_k, w_k = inp  # [K, S, A, N, D, 2], [K]
                    pts = cent_k.transpose(0, 1, 3, 2, 4, 5).reshape(
                        K * S * N, A * D, 2
                    )
                    pts = pts - jnp.mean(pts, axis=1, keepdims=True)
                    sq = jnp.sum(pts * pts, axis=-1)  # [KSN, AD]
                    gram = jnp.einsum("bik,bjk->bij", pts, pts)
                    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * gram
                    dist = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)
                    pair = jnp.min(
                        dist.reshape(K * S * N, A, D, A, D), axis=(2, 4)
                    )  # [KSN, A, A]
                    pair = pair.reshape(K, S, N, A, A).transpose(0, 1, 3, 4, 2)
                    pd = pen_d[None, ..., None]
                    colliding = (pair <= pd) & pair_valid[None, ..., None]
                    pen = jnp.where(colliding, 1.0 - pair / pd, 0.0)
                    return acc + jnp.einsum("k,ksabn->sabn", w_k, pen), None

                acc, _ = jax.lax.scan(
                    step_blk, jnp.zeros((S, A, A, N)), (cent_tw, w_c)
                )
            else:
                cent_tw = jnp.pad(
                    cent_w.reshape(S, A, N, T, D, 2).transpose(3, 0, 1, 2, 4, 5),
                    ((0, pad),) + ((0, 0),) * 5,
                    constant_values=1e6,  # padded steps land far -> no collision
                ).reshape(-1, K, S, A, N, D, 2)

                @jax.checkpoint
                def step_blk(acc, inp):
                    cent_k, w_k = inp  # [K, S, A, N, D, 2], [K]
                    diff = (
                        cent_k[:, :, :, None, :, :, None, :]
                        - cent_k[:, :, None, :, :, None, :, :]
                    )  # [K, S, A, A, N, D, D, 2]
                    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)
                    pair = jnp.min(dist.reshape(K, S, A, A, N, -1), axis=-1)
                    pd = pen_d[None, ..., None]
                    colliding = (pair <= pd) & pair_valid[None, ..., None]
                    pen = jnp.where(colliding, 1.0 - pair / pd, 0.0)
                    return acc + jnp.einsum("k,ksabn->sabn", w_k, pen), None

                acc, _ = jax.lax.scan(
                    step_blk, jnp.zeros((S, A, A, N)), (cent_tw, w_c)
                )
            # sum over in-block others / full B == the flat path's mean over
            # B (cross-scene pairs are zero there)
            per_agent = (jnp.sum(acc, axis=2) / B).reshape(B, N)
            return jnp.where(moving[:, None], per_agent, 0.0)

        penalty_dists = agt_rad[:, None] + agt_rad[None, :] + self.buffer_dist  # [B, B]
        same_scene = ctx.scene_index[:, None] == ctx.scene_index[None, :]
        pair_valid = same_scene & ~jnp.eye(B, dtype=bool)
        if exc is not None:
            pair_valid = pair_valid & ~(exc[:, None] & exc[None, :])

        # Chunked scan over the horizon instead of materializing the full
        # [N, T, B, B, D, D] pairwise tensor (O(B^2 D^2 T) HBM). A per-step
        # scan would bound memory hardest but serializes T tiny steps —
        # latency-poison on TPU — so we scan CHUNKS sized to a fixed element
        # budget: each step processes a dense [K, B, B, N, D, D] tile (big
        # enough to keep the VPU busy), and jax.checkpoint recomputes the
        # tile on the guidance-gradient backward pass.
        K = _time_chunk(T, B * B * N * D * D)
        pad = (-T) % K
        cent_tw = jnp.pad(
            cent_w.transpose(2, 0, 1, 3, 4), ((0, pad), (0, 0), (0, 0), (0, 0), (0, 0)),
            constant_values=1e6,  # padded steps land far away -> no collision
        ).reshape(-1, K, B, N, D, 2)
        w_c = jnp.pad(w, (0, pad)).reshape(-1, K)

        @jax.checkpoint
        def step(acc, inp):
            cent_k, w_k = inp  # [K, B, N, D, 2], [K]
            diff = (
                cent_k[:, :, None, :, :, None, :] - cent_k[:, None, :, :, None, :, :]
            )  # [K, B, B, N, D, D, 2]
            dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)
            pair = jnp.min(dist.reshape(K, B, B, N, -1), axis=-1)  # [K, B, B, N]
            colliding = (pair <= penalty_dists[None, ..., None]) & pair_valid[None, ..., None]
            pen = jnp.where(colliding, 1.0 - pair / penalty_dists[None, ..., None], 0.0)
            return acc + jnp.einsum("k,kijn->ijn", w_k, pen), None

        acc, _ = jax.lax.scan(step, jnp.zeros((B, B, N)), (cent_tw, w_c))
        per_agent = jnp.mean(acc, axis=1)  # mean over other agents -> [B, N]
        return jnp.where(moving[:, None], per_agent, 0.0)


@dataclasses.dataclass(frozen=True)
class MapCollisionLoss:
    """Offroad penalty with an on-road-pull gradient
    (`guidance_loss.py:717-871`): sample a grid of points in each agent
    bbox; for off-road points, maximize distance to (detached) on-road
    points via loss 1 - min_dist/diag."""

    num_points_lw: Tuple[int, int] = (10, 10)
    decay_rate: float = 0.9
    guide_moving_speed_th: float = 0.5
    # drivable-map lookup: "auto" (pallas one-hot-matmul kernel on TPU —
    # ~5 ms/denoise-step faster than the fancy-index gather at B=128 —
    # plain jnp gather elsewhere), or force "jnp" / "pallas" (bit-packed
    # one-hot matmul) / "pallas_px" (unpacked int8 one-hot matmul)
    gather_impl: str = "auto"
    # min-distance kernel (all numerically equivalent):
    #   "separable"   exact two-pass EDT over the regular bbox grid,
    #                 O(P*(R+C)) — the default. Measured on v5e at bench
    #                 scale (B=128, N=1, T=52, P=100): map guidance adds
    #                 +0.37 ms/denoise-step vs +~0.6 ms for "rigid"
    #                 (guided agent+map pipeline 185.8k vs 131.9k NFE/s,
    #                 scripts/guided_breakdown.py r3);
    #   "separable_xy" separable values (bitwise equal) with the routing-free
    #                 moment backward at the (pos, yaw) boundary — both
    #                 one-hot routing stages, the per-point grad tensor and
    #                 the rotate-chain backward disappear (see
    #                 _min_dist_separable_xy);
    #   "separable_xy_bf16" the xy moment path with bf16 EDT sweeps (double
    #                 VPU lanes, ~2^-8 relative distance error, f32
    #                 assembly — same error class as rigid "bf16");
    #   "rigid"       pose-invariant P x P distance cache hoisted out of the
    #                 sampling loop + analytic argmin backward;
    #   "rigid_pallas" fully VMEM-resident pallas fwd/bwd of "rigid";
    #   "pairwise"    direct P x P distances (checkpointed)
    min_dist_impl: str = "separable"
    # forward of the full-horizon "rigid" masked min: "jnp" (XLA fuses the
    # [B, Q, P, P] broadcast into the min/argmin reduces — measured fastest
    # on v5e, 0.90 vs 1.16 ms/step for the pallas kernel at bench scale,
    # scripts/micro_map_combos.py), "fused" (1-D-grid pallas kernel that
    # sweeps the horizon in-kernel; loses to XLA's fusion because the
    # per-program sweep is sequential), or "eqmin" (plain-min forward, no
    # variadic argmin reduce — the index is recovered in the backward by
    # exact-equality + index-min; bitwise-identical values and grads).
    # "auto" = "jnp". "bf16" runs the masked min + equality backward in
    # bfloat16 (f32 accumulation/assembly): ~2^-8 relative distance error,
    # guidance-gradient cosine 0.9999+ vs f32 (scripts/micro_rigid_bf16.py).
    min_fwd_impl: str = "auto"

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        if self.min_fwd_impl not in ("auto", "jnp", "fused", "eqmin", "bf16"):
            raise ValueError(
                f"unknown min_fwd_impl {self.min_fwd_impl!r} "
                "(expected auto|jnp|fused|eqmin|bf16)"
            )
        B, N, T, _ = x.shape
        P = self.num_points_lw[0] * self.num_points_lw[1]
        lwise = np.linspace(-0.5, 0.5, self.num_points_lw[0])
        wwise = np.linspace(-0.5, 0.5, self.num_points_lw[1])

        pos = x[..., :2]  # [B, N, T, 2]
        yaw = x[..., 3]
        lw = ctx.extent[:, :2]
        diag_len = jnp.sqrt(jnp.sum(lw * lw, axis=-1))  # [B]

        # extent-scaled bbox points: prepacked (hoisted out of the sampling
        # scan, see prepack_map_bbox) or recomputed when absent/mismatched.
        # The reuse guard is an EXACT (R, C) grid-shape match — a flat point
        # count alone would accept a different factorization of the same
        # product (e.g. (20, 5) vs (10, 10)) and silently score the wrong
        # grid geometry.
        grid_match = (
            ctx.bbox_pts is not None
            and ctx.bbox_pts.shape[1:3] == tuple(self.num_points_lw)
        )
        if grid_match:
            pts = ctx.bbox_pts.reshape(B, P, 2)
        else:
            pts = bbox_local_grid(self.num_points_lw)[None] * lw[:, None, :]

        def pairwise_d2():
            if grid_match and ctx.bbox_d2 is not None:
                return ctx.bbox_d2  # [B, P, P]
            return jnp.sum(
                (pts[:, :, None, :] - pts[:, None, :, :]) ** 2, axis=-1
            )
        c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]  # [B, N, T, 1]
        px = pts[:, None, None, :, 0]
        py = pts[:, None, None, :, 1]
        # row-vector rotation p @ [[c, s], [-s, c]] (guidance_loss.py:745-748)
        rx = px * c + py * (-s)
        ry = px * s + py * c
        agt_pts = jnp.stack([rx, ry], axis=-1) + pos[..., None, :]  # [B, N, T, P, 2]

        # raster query (detached ints)
        pix = transform_points(agt_pts.reshape(B, -1, 2), ctx.raster_from_agent)
        pix = jax.lax.stop_gradient(pix.reshape(B, N, T, P, 2))
        H, W = ctx.drivable_map.shape[-2:]
        col = jnp.clip(pix[..., 0].astype(jnp.int32), 0, W - 1)
        row = jnp.clip(pix[..., 1].astype(jnp.int32), 0, H - 1)
        impl = self.gather_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
        if impl == "pallas":
            from cld_tpu.ops.pallas_kernels import drivable_bit_gather_pallas

            pixq = jnp.stack([col, row], axis=-1).reshape(B, N * T * P, 2)
            # only the on/off-road bit is consumed, so the map binarizes and
            # bit-packs 8 columns/byte (ideally once per context via
            # prepack_drivable — packing here lands inside the denoise scan
            # body and repeats every step) and the one-hot matmul fetches
            # packed bytes: 8x fewer MACs than gathering raw pixels
            if ctx.drivable_packed is not None:
                vals = drivable_bit_gather_pallas(
                    pixq, ctx.drivable_packed, prepacked=True,
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                vals = drivable_bit_gather_pallas(
                    pixq, ctx.drivable_map,
                    interpret=jax.default_backend() != "tpu",
                )
            offroad = vals.reshape(B, N, T, P) <= 0
        elif impl == "pallas_px":
            from cld_tpu.ops.pallas_kernels import drivable_gather_pallas

            pixq = jnp.stack([col, row], axis=-1).reshape(B, N * T * P, 2)
            drv8 = (ctx.drivable_map > 0).astype(jnp.int8)
            vals = drivable_gather_pallas(
                pixq, drv8, interpret=jax.default_backend() != "tpu"
            )
            offroad = vals.reshape(B, N, T, P) <= 0
        else:
            b_idx = jnp.arange(B).reshape(B, 1, 1, 1)
            offroad = ctx.drivable_map[b_idx, row, col] <= 0  # [B, N, T, P]

        per_step_coll = jnp.sum(offroad, axis=-1)
        overlap = (per_step_coll > 0) & (per_step_coll < P)  # [B, N, T]

        # Pairwise distances rows=live points, cols=detached points
        # (guidance_loss.py:826-850): mask off-road ROWS, min over rows ->
        # per detached point, distance to the nearest live on-road point.
        # Loss 1 - d/diag at off-road columns then *pushes the live on-road
        # points away from the (fixed) off-road region*, i.e. pulls the
        # agent back onto the road. The P x P squared distances reduce
        # inside `_min_dist_to_onroad` before the sqrt, so the pairwise
        # matrix stays inside one fused compare-and-reduce. Chunk-scanned
        # over the horizon to bound the tile at scene scale (_time_chunk).
        w = _decay_weights(T, self.decay_rate)

        if self.min_dist_impl in ("separable", "separable_xy", "separable_xy_bf16"):
            # exact separable EDT over the regular bbox grid (see
            # _min_dist_separable) — full horizon at once, no chunk scan
            R, C = self.num_points_lw
            li = jnp.asarray(lwise, jnp.float32)
            wi = jnp.asarray(wwise, jnp.float32)
            rd2 = ((li[:, None] - li[None]) ** 2)[None] * (lw[:, 0] ** 2)[:, None, None]
            cd2 = ((wi[:, None] - wi[None]) ** 2)[None] * (lw[:, 1] ** 2)[:, None, None]
            if self.min_dist_impl in ("separable_xy", "separable_xy_bf16"):
                # routing-free vjp at the (pos, yaw) boundary: bitwise-equal
                # values, pose gradients assembled from offset moments (see
                # _min_dist_separable_xy). agt_pts above then only feeds the
                # detached pix query, so XLA drops the rotate backward too.
                # The bf16 twin runs the EDT sweeps at double VPU lanes
                # (~2^-8 relative distance error, f32 assembly).
                fn = (
                    _min_dist_separable_xy_bf16
                    if self.min_dist_impl == "separable_xy_bf16"
                    else _min_dist_separable_xy
                )
                min_dist = fn(
                    pos.reshape(B, N * T, 2), yaw.reshape(B, N * T),
                    (~offroad).reshape(B, N * T, P), rd2, cd2, li, wi, lw,
                ).reshape(B, N, T, P)
            else:
                min_dist = _min_dist_separable(
                    agt_pts.reshape(B, N * T, P, 2),
                    (~offroad).reshape(B, N * T, P), rd2, cd2,
                ).reshape(B, N, T, P)
            pt_loss = 1.0 - min_dist / diag_len[:, None, None, None]
            has_onroad = jnp.any(~offroad, axis=-1, keepdims=True)
            pt_loss = jnp.where(offroad & has_onroad, pt_loss, 0.0)
            step_loss = jnp.where(overlap, jnp.sum(pt_loss, axis=-1), 0.0)
            w = _decay_weights(T, self.decay_rate)
            loss = jnp.einsum("t,bnt->bn", w, step_loss)
            moving = jnp.abs(ctx.curr_speed) > self.guide_moving_speed_th
            return jnp.where(moving[:, None], loss, 0.0)

        if self.min_dist_impl == "rigid_pallas":
            # Full-horizon pallas path: no chunk scan — the distance cache
            # and backward routing are VMEM-resident, so there is nothing
            # pairwise to bound in HBM.
            d2_local = pairwise_d2()  # [B, P, P]
            interp = jax.default_backend() != "tpu"
            min_dist = _min_dist_rigid_pallas(
                agt_pts.reshape(B, N * T, P, 2), d2_local,
                (~offroad).reshape(B, N * T, P), interp,
            ).reshape(B, N, T, P)
            pt_loss = 1.0 - min_dist / diag_len[:, None, None, None]
            has_onroad = jnp.any(~offroad, axis=-1, keepdims=True)
            pt_loss = jnp.where(offroad & has_onroad, pt_loss, 0.0)
            step_loss = jnp.where(overlap, jnp.sum(pt_loss, axis=-1), 0.0)
            w = _decay_weights(T, self.decay_rate)
            loss = jnp.einsum("t,bnt->bn", w, step_loss)
            moving = jnp.abs(ctx.curr_speed) > self.guide_moving_speed_th
            return jnp.where(moving[:, None], loss, 0.0)

        if self.min_dist_impl == "rigid":
            # Pose-invariant pairwise distances between the agent's own bbox
            # points: computed ONCE per agent and hoisted out of the
            # sampling loop (it only depends on the extent-scaled local
            # grid), so each denoise step pays just a masked min + the
            # analytic argmin-routed backward. Distances equal the pairwise
            # path up to rotation rounding.
            if T * B * N * P * P <= _FULL_HORIZON_BUDGET:
                # Direct full-horizon path: at rollout scale the whole
                # [B, N*T, P, P] masked min fits comfortably, and skipping
                # the chunk scan's pad/transpose plumbing is worth
                # ~1.3 ms/denoise-step at B=128 (measured on v5e,
                # scripts/guided_breakdown.py map vs map_full)
                d2_local = pairwise_d2()
                if self.min_fwd_impl == "fused":
                    # fused pallas forward: no [B, Q, P, P] HBM transient
                    min_dist = _min_dist_rigid_fused(
                        agt_pts.reshape(B, N * T, P, 2), d2_local,
                        (~offroad).reshape(B, N * T, P),
                        jax.default_backend() != "tpu",
                    ).reshape(B, N, T, P)
                elif self.min_fwd_impl == "eqmin":
                    # argmin-free forward (plain min only; index recovered
                    # in the backward by equality + index-min)
                    min_dist = _min_dist_rigid_eqmin(
                        agt_pts.reshape(B, N * T, P, 2), d2_local[:, None],
                        (~offroad).reshape(B, N * T, P),
                    ).reshape(B, N, T, P)
                elif self.min_fwd_impl == "bf16":
                    min_dist = _min_dist_rigid_bf16(
                        agt_pts.reshape(B, N * T, P, 2), d2_local[:, None],
                        (~offroad).reshape(B, N * T, P),
                    ).reshape(B, N, T, P)
                else:
                    min_dist = _min_dist_rigid(
                        agt_pts.reshape(B, N * T, P, 2), d2_local[:, None],
                        (~offroad).reshape(B, N * T, P),
                    ).reshape(B, N, T, P)
                pt_loss = 1.0 - min_dist / diag_len[:, None, None, None]
                has_onroad = jnp.any(~offroad, axis=-1, keepdims=True)
                pt_loss = jnp.where(offroad & has_onroad, pt_loss, 0.0)
                step_loss = jnp.where(overlap, jnp.sum(pt_loss, axis=-1), 0.0)
                loss = jnp.einsum("t,bnt->bn", w, step_loss)
                moving = jnp.abs(ctx.curr_speed) > self.guide_moving_speed_th
                return jnp.where(moving[:, None], loss, 0.0)

            if self.min_fwd_impl not in ("auto", "jnp"):
                # the A/B forward schedules only exist on the full-horizon
                # path; silently falling back would corrupt a measurement
                raise ValueError(
                    f"min_fwd_impl={self.min_fwd_impl!r} requires the "
                    f"full-horizon path (T*B*N*P*P={T * B * N * P * P} > "
                    f"CLD_GUIDE_FULL_ELEMS={_FULL_HORIZON_BUDGET}); raise the "
                    "budget or use the default forward"
                )
            d2_local = pairwise_d2().reshape(1, B, 1, P, P)

            def min_dist_fn(pts_k, off_k):
                return _min_dist_rigid(pts_k, d2_local, ~off_k)
            use_ckpt = False
        else:
            def min_dist_fn(pts_k, off_k):
                return _min_dist_to_onroad(pts_k, ~off_k)
            # jax.checkpoint is load-bearing here: without it the
            # [K,B,N,P,P] squared distances become a grad residual
            # (materialized to HBM); with it both passes are single fused
            # compare-and-reduce sweeps
            use_ckpt = True

        def step(acc, inp):
            pts_k, off, ov, w_k = inp  # [K,B,N,P,2], [K,B,N,P], [K,B,N], [K]
            min_dist = min_dist_fn(pts_k, off)  # [K, B, N, P]
            pt_loss = 1.0 - min_dist / diag_len[None, :, None, None]
            # only off-road points with at least one on-road partner count
            # (`ov` already implies one exists; the explicit guard keeps the
            # masked _BIG_D2 sentinel out of the loss)
            has_onroad = jnp.any(~off, axis=-1, keepdims=True)
            pt_loss = jnp.where(off & has_onroad, pt_loss, 0.0)
            # steps fully on/off road contribute nothing (no grad direction)
            step_loss = jnp.where(ov, jnp.sum(pt_loss, axis=-1), 0.0)  # [K, B, N]
            return acc + jnp.einsum("k,kbn->bn", w_k, step_loss), None

        if use_ckpt:
            step = jax.checkpoint(step)
        # chunk-scan plumbing (built only on this path — the full-horizon
        # branches above return before needing it)
        K = _time_chunk(T, B * N * P * P)
        pad = (-T) % K
        pts_t = jnp.pad(
            agt_pts.transpose(2, 0, 1, 3, 4), ((0, pad),) + ((0, 0),) * 4
        ).reshape(-1, K, B, N, P, 2)
        off_t = jnp.pad(offroad.transpose(2, 0, 1, 3), ((0, pad),) + ((0, 0),) * 3)
        off_t = off_t.reshape(-1, K, B, N, P)
        ov_t = jnp.pad(overlap.transpose(2, 0, 1), ((0, pad), (0, 0), (0, 0)))
        ov_t = ov_t.reshape(-1, K, B, N)
        w_c = jnp.pad(w, (0, pad)).reshape(-1, K)
        loss, _ = jax.lax.scan(step, jnp.zeros((B, N)), (pts_t, off_t, ov_t, w_c))
        moving = jnp.abs(ctx.curr_speed) > self.guide_moving_speed_th
        return jnp.where(moving[:, None], loss, 0.0)


@dataclasses.dataclass(frozen=True)
class TargetPosAtTimeLoss:
    """Hit waypoints at specific steps (`guidance_loss.py:632-670`)."""

    target_pos: np.ndarray  # [B, 2]
    target_time: np.ndarray  # [B] int

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        tgt = jnp.asarray(self.target_pos, jnp.float32)
        tt = jnp.asarray(self.target_time, jnp.int32)
        x_at = x[jnp.arange(x.shape[0]), :, tt, :2]  # [B, N, 2]
        return jnp.linalg.norm(x_at - tgt[:, None], axis=-1)


@dataclasses.dataclass(frozen=True)
class TargetPosLoss:
    """Hit waypoints at any sufficiently-late step, softmin-weighted
    (`guidance_loss.py:672-711`)."""

    target_pos: np.ndarray  # [B, 2]
    min_target_time: float = 0.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        T = x.shape[2]
        min_t = int(self.min_target_time * T)
        pos = x[:, :, min_t:, :2]
        tgt = jnp.asarray(self.target_pos, jnp.float32)[:, None, None]
        dist = jnp.linalg.norm(pos - tgt, axis=-1)
        weight = jax.nn.softmax(-dist, axis=-1)
        loss = weight * jnp.sum((pos - tgt) ** 2, axis=-1)
        return jnp.mean(loss, axis=-1)


@dataclasses.dataclass(frozen=True)
class GlobalTargetPosLoss:
    """Progress toward a world-frame goal beyond the horizon
    (`guidance_loss.py:838-930,1033-1135`, simplified progress form)."""

    target_pos_world: np.ndarray  # [B, 2]
    urgency: np.ndarray | float = 0.5
    pref_speed: np.ndarray | float = 1.42  # scalar or per-agent [B]
    dt: float = 0.1
    min_progress_dist: float = 0.5

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        pos_w, _ = _to_world(x, ctx.world_from_agent)
        tgt = jnp.asarray(self.target_pos_world, jnp.float32)
        urgency = jnp.broadcast_to(jnp.asarray(self.urgency, jnp.float32), (x.shape[0],))
        pref = jnp.broadcast_to(jnp.asarray(self.pref_speed, jnp.float32), (x.shape[0],))
        final_dist = jnp.linalg.norm(pos_w[:, :, -1] - tgt[:, None], axis=-1)
        init_dist = jnp.linalg.norm(pos_w[:, :, 0] - tgt[:, None], axis=-1)
        max_horizon_dist = x.shape[2] * self.dt * pref
        goal_dist = jnp.maximum(urgency * max_horizon_dist, self.min_progress_dist)
        progress = init_dist - final_dist
        return jax.nn.relu(goal_dist[:, None] - progress)


def _agent_from_world(ctx: GuidanceContext) -> jnp.ndarray:
    if ctx.agent_from_world is not None:
        return ctx.agent_from_world
    return jnp.linalg.inv(ctx.world_from_agent)


@dataclasses.dataclass(frozen=True)
class GlobalTargetPosAtTimeLoss:
    """Hit a world-frame waypoint at a *global* sim time
    (`guidance_loss.py:930-1031`): while the target frame is beyond the
    planning horizon, apply a progress loss (cover target_time*dt*pref_speed
    scaled down by urgency); once the target frame falls inside the horizon,
    switch to the exact TargetPosAtTimeLoss on the agent-frame projection.

    The reference latches a stateful `have_reached_mask` across rollout
    steps; here reaching is re-evaluated statelessly each call from the
    agent's current world position (ctx.world_from_agent translation), which
    matches the latch as long as reached agents stay within the tolerance.
    """

    target_pos_world: np.ndarray  # [B, 2]
    target_time: np.ndarray  # [B] int global frame indices
    urgency: np.ndarray | float = 0.5
    pref_speed: np.ndarray | float = 1.42  # scalar or per-agent [B]
    dt: float = 0.1
    target_tolerance: Optional[float] = 2.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        B, N, T, _ = x.shape
        tgt_w = jnp.asarray(self.target_pos_world, jnp.float32)
        tt = jnp.asarray(self.target_time, jnp.int32)
        urgency = jnp.broadcast_to(jnp.asarray(self.urgency, jnp.float32), (B,))
        global_t = (
            ctx.global_t if ctx.global_t is not None else jnp.zeros((), jnp.int32)
        )
        local_tgt = transform_points(tgt_w[:, None], _agent_from_world(ctx))[:, 0]
        local_tt = tt - global_t  # [B]
        exact = (local_tt >= 0) & (local_tt < T)
        prog = (local_tt >= 0) & ~exact

        # exact branch (TargetPosAtTimeLoss at the clipped local index)
        idx = jnp.clip(local_tt, 0, T - 1)
        x_at = x[jnp.arange(B), :, idx, :2]  # [B, N, 2]
        exact_loss = jnp.linalg.norm(x_at - local_tgt[:, None], axis=-1)

        # progress branch (compute_progress_loss with tgt_time,
        # guidance_loss.py:900-912): straight-path distance for the
        # remaining time, shortened by urgency
        final_dist = jnp.linalg.norm(x[:, :, -1, :2] - local_tgt[:, None], axis=-1)
        pref = jnp.broadcast_to(jnp.asarray(self.pref_speed, jnp.float32), (B,))
        goal_dist = local_tt.astype(jnp.float32) * self.dt * pref
        goal_dist = goal_dist * (1.0 - urgency)
        prog_loss = jax.nn.relu(final_dist - goal_dist[:, None])

        loss = jnp.where(exact[:, None], exact_loss, jnp.where(prog[:, None], prog_loss, 0.0))
        if self.target_tolerance is not None:
            cur_pos_w = ctx.world_from_agent[:, :2, 2]
            reached = jnp.linalg.norm(cur_pos_w - tgt_w, axis=-1) < self.target_tolerance
            loss = jnp.where(reached[:, None], 0.0, loss)
        return loss


_STL_BIG = 1e6


def _stl_minish(r, axis, scale):
    """stlcg-convention soft min: scale > 0 -> -logsumexp(-scale*r)/scale
    (larger scale = harder; "positive values closer to 0 give more uniform
    gradients", `guidance_loss.py:1229` comment), scale <= 0 -> hard min
    (`stl_traffic_rules.py:163` get_robustness default scale=-1)."""
    if scale > 0:
        return -jax.nn.logsumexp(-scale * r, axis=axis) / scale
    return jnp.min(r, axis=axis)


def _stl_maxish(r, axis, scale):
    if scale > 0:
        return jax.nn.logsumexp(scale * r, axis=axis) / scale
    return jnp.max(r, axis=axis)


def _stop_sign_robustness(
    pos, speed, center, half, *, scale, horizon_length, time_step_to_start,
    num_time_steps_to_stop, low_speed_th,
):
    """Robustness of the reference stop-sign STL formula
    (`stl_traffic_rules.py:74-125` set_stl_rules, use_until=False — the
    module-level default at `guidance_loss.py:1212`):

        Always(Implies(in_box, Eventually_[t0,H](Always_[0,k](in & slow))))
        Or (out_box And middle_speed)            # evaluated at trace start

    consumed at trace start (`get_robustness` returns the t=0 robustness).
    Consequences worth noting: a vehicle currently OUTSIDE the box at
    above-threshold speed satisfies the second disjunct, so robustness is
    positive and `relu(-rob)` gives zero loss AND zero gradient — the rule
    only shapes trajectories once the vehicle is in (or entering) the box.

    Semantics notes vs stlcg (not vendored by the reference, so matched at
    the level of its documented conventions): And/Or/Always/Eventually are
    soft min/max at temperature `scale` (hard at scale <= 0, stlcg's
    default); bounded Always windows truncate at the trace end (stlcg's
    recurrent cells initialize with +LARGE, so partial end windows reduce
    over the available frames); Always_[0,k] spans k+1 frames (inclusive
    interval).

    pos [B, N, T, 2] trajectory positions in the SAME frame as `center`;
    speed [B, N, T] signed scalar velocity; center/half [B, 2].
    """
    T = pos.shape[-2]
    # in-box: And of the four one-sided bound predicates
    # ((px >= x_min) & (px <= x_max) & ..., `stl_traffic_rules.py:87-89`)
    lo_m = pos - (center - half)[:, None, None]  # [B, N, T, 2]
    hi_m = (center + half)[:, None, None] - pos
    inside_r = _stl_minish(
        jnp.concatenate([lo_m, hi_m], axis=-1), -1, scale
    )  # [B, N, T]
    # low_speed = (v >= -th) & (v <= th); middle_speed = Not(low_speed)
    low_r = _stl_minish(
        jnp.stack([speed + low_speed_th, low_speed_th - speed], -1), -1, scale
    )
    both = _stl_minish(jnp.stack([inside_r, low_r], -1), -1, scale)

    # Always_[0,k](in & slow): k+1-frame windows, truncated at the end
    kk = min(num_time_steps_to_stop + 1, T)
    pad = jnp.full(both.shape[:-1] + (kk - 1,), _STL_BIG, both.dtype)
    both_p = jnp.concatenate([both, pad], axis=-1)
    win_r = _stl_minish(
        jnp.stack([both_p[..., i : T + i] for i in range(kk)], -1), -1, scale
    )  # [B, N, T] window start s

    # Eventually_[t0,H] per anchor t: max over s in [t+t0, t+H] (clipped)
    t_idx = jnp.arange(T)[:, None]  # anchor t
    s_idx = jnp.arange(T)[None, :]  # window start s
    valid = (s_idx >= t_idx + time_step_to_start) & (
        s_idx <= t_idx + horizon_length
    )  # [T, T]
    masked = jnp.where(valid, win_r[..., None, :], -_STL_BIG)
    ev_r = _stl_maxish(masked, -1, scale)  # [B, N, T] per anchor t

    # Always(Implies(in_box, stop)): Implies = Or(Not(in), stop)
    imp = _stl_maxish(jnp.stack([-inside_r, ev_r], -1), -1, scale)
    a_term = _stl_minish(imp, -1, scale)  # [B, N]
    # out_box & middle_speed at trace start
    b_term = _stl_minish(
        jnp.stack([-inside_r[..., 0], -low_r[..., 0]], -1), -1, scale
    )
    return _stl_maxish(jnp.stack([a_term, b_term], -1), -1, scale)


@dataclasses.dataclass(frozen=True)
class GlobalStopSignLoss:
    """World-frame stop-sign rule (`guidance_loss.py:1318-1442`): vehicles
    entering the stop box must hold low speed for `num_time_steps_to_stop`
    steps inside it. Loss = -clip(robustness, max=0) of the reference STL
    formula (see `_stop_sign_robustness`), masked by the already-stopped
    latch.

    The reference latches `already_stopped` across rollout steps
    (`guidance_loss.py:1372-1420`): at each replan it counts low-speed
    in-box frames among the last `action_num` history frames — latched when
    the count reaches `num_time_steps_to_stop` (not necessarily
    consecutive), released when the newest frame is outside the box. Here
    the latch is re-derived statelessly each call from the FULL
    `ctx.agent_hist_world` window: latched iff some `action_num`-frame
    window ending at frame j has count >= k and the vehicle stays in-box
    from j to the present (box exit = release). This matches the reference
    while the stop event is inside the history window (hist_frames+1
    frames, ~3 s at the config of record) and treats every frame as a
    potential replan boundary (the reference only checks every
    `action_num` frames). Divergence windows (both re-penalize here where
    the reference stays latched): (a) a vehicle that stopped, then stayed
    inside the box for LONGER than the history length; (b) a vehicle that
    briefly EXITS and re-enters the box BETWEEN the reference's
    action_num-aligned latch checks — the reference only samples the
    newest history frame at each replan and never sees the excursion,
    while the stateless suffix test here releases on any out-of-box frame.
    Both err toward re-applying the stop rule, never toward skipping it.
    """

    stop_sign_pos: np.ndarray  # [B, 2] world-frame box centers
    stop_box_dim: np.ndarray  # [B, 2] full box dims (w, h)
    # stlcg smoothing: soft min/max temperature, hard at <= 0; 20 is the
    # reference's example config value (scene_edit_config.py:285)
    scale: float = 20.0
    horizon_length: int = 52
    time_step_to_start: int = 0
    num_time_steps_to_stop: int = 3
    action_num: int = 5
    low_speed_th: float = 0.5

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        center = jnp.asarray(self.stop_sign_pos, jnp.float32)
        half = jnp.asarray(self.stop_box_dim, jnp.float32) / 2.0
        pos_w, _ = _to_world(x, ctx.world_from_agent)  # [B, N, T, 2]
        robustness = _stop_sign_robustness(
            pos_w, x[..., 2], center, half, scale=self.scale,
            horizon_length=self.horizon_length,
            time_step_to_start=self.time_step_to_start,
            num_time_steps_to_stop=self.num_time_steps_to_stop,
            low_speed_th=self.low_speed_th,
        )
        loss = jax.nn.relu(-robustness)

        if ctx.agent_hist_world is not None:
            hist = ctx.agent_hist_world  # [B, Th, 4] full history window
            Th = hist.shape[1]
            in_box = jnp.all(
                jnp.abs(hist[..., :2] - center[:, None]) <= half[:, None], axis=-1
            )  # [B, Th]
            low = jnp.abs(hist[..., 2]) < self.low_speed_th
            # frames from the last out-of-box frame onward: the latch only
            # survives while the vehicle has stayed in the box since
            # stopping (the reference releases it at box exit,
            # `guidance_loss.py:1419-1420` outside_mask)
            since_exit = jnp.flip(
                jnp.cumprod(jnp.flip(in_box, -1), -1), -1
            ).astype(bool)  # [B, Th] suffix all-in-box
            # windowed COUNT of low-speed in-box frames (the reference sums
            # inclusion & low_speed over the last action_num frames,
            # `guidance_loss.py:1410` — not a consecutive-run test)
            ok = (low & in_box).astype(jnp.int32)
            a = max(1, min(self.action_num, Th))
            csum0 = jnp.concatenate(
                [jnp.zeros(ok.shape[:-1] + (1,), jnp.int32), jnp.cumsum(ok, -1)],
                axis=-1,
            )  # csum0[..., j] = count of ok among frames < j
            start = np.maximum(np.arange(Th) - a + 1, 0)  # static [Th]
            # count over the a-frame window ending at j (partial at the
            # start of the history window)
            cnt = csum0[..., 1:] - csum0[..., start]
            set_j = cnt >= self.num_time_steps_to_stop
            already = jnp.any(set_j & since_exit, axis=-1)  # [B]
            loss = jnp.where(already[:, None], 0.0, loss)
        return loss


@dataclasses.dataclass(frozen=True)
class AccLimitLoss:
    """Penalize |acc| above a limit (`guidance_loss.py:1444-1469`)."""

    acc_limit: float = 2.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        dev = jnp.abs(x[..., 4]) - self.acc_limit
        return jnp.mean(jax.nn.relu(dev), axis=-1)


@dataclasses.dataclass(frozen=True)
class SpeedLimitLoss:
    """Penalize |v| above a limit (`guidance_loss.py:1509-1538`)."""

    speed_limit: float = 15.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        dev = jnp.abs(x[..., 2]) - self.speed_limit
        return jnp.mean(jax.nn.relu(dev), axis=-1)


@dataclasses.dataclass(frozen=True)
class StopSignLoss:
    """Agent-frame stop-sign rule (`guidance_loss.py:1214-1318`): the same
    STL robustness as GlobalStopSignLoss (`_stop_sign_robustness`), loss =
    -clip(robustness, max=0), no cross-replan latch (the reference's local
    variant passes already_stopped=zeros, `guidance_loss.py:1307-1310`).

    Frame note: the reference's local heuristic emits the box center in the
    AGENT frame (`scene_edit_utils.py:494-497` "convert to local frame")
    while its loss transforms trajectory positions to WORLD frame under the
    hardcoded use_global_coord=True (`guidance_loss.py:1299-1301`) — a
    cross-frame comparison that only works when the two frames coincide.
    Here both sides stay in the agent frame (the heuristic's intent); the
    world-frame behavior lives in GlobalStopSignLoss.
    """

    stop_sign_pos: np.ndarray  # [B, 2] agent-frame box centers
    # [B, 2] FULL box dims (bounds = center +/- dim/2) — the reference's
    # convention for this exact parameter name (stl_traffic_rules.py Box:
    # set_bounds divides by 2), shared with GlobalStopSignLoss so the same
    # config value means the same box for both rules
    stop_box_dim: np.ndarray
    # stlcg smoothing: soft min/max temperature, hard at <= 0; 20 is the
    # reference's example config value (scene_edit_config.py:285)
    scale: float = 20.0
    horizon_length: int = 52
    time_step_to_start: int = 0
    num_time_steps_to_stop: int = 3
    action_num: int = 5  # config-compat knob; unused by the loss math
    low_speed_th: float = 0.5

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        center = jnp.asarray(self.stop_sign_pos, jnp.float32)
        half = jnp.asarray(self.stop_box_dim, jnp.float32) / 2.0
        robustness = _stop_sign_robustness(
            x[..., :2], x[..., 2], center, half, scale=self.scale,
            horizon_length=self.horizon_length,
            time_step_to_start=self.time_step_to_start,
            num_time_steps_to_stop=self.num_time_steps_to_stop,
            low_speed_th=self.low_speed_th,
        )
        return jax.nn.relu(-robustness)


@dataclasses.dataclass(frozen=True)
class KeepDistanceLoss:
    """Keep the distance between two agents inside [min_dist, max_dist]
    (`guidance_loss.py:1631-1739` keep_distance / gptkeepdistance)."""

    target_ind: int
    ref_ind: int
    min_dist: float = 5.0
    max_dist: float = 15.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        pos_w, _ = _to_world(x, ctx.world_from_agent)
        d = jnp.linalg.norm(
            pos_w[self.target_ind] - pos_w[self.ref_ind], axis=-1
        )  # [N, T]
        over = jax.nn.relu(d - self.max_dist) + jax.nn.relu(self.min_dist - d)
        loss = jnp.zeros(x.shape[:2])
        return loss.at[self.target_ind].set(jnp.mean(over, axis=-1))

    def affected_agents(self):
        return (self.target_ind,)


@dataclasses.dataclass(frozen=True)
class CollisionAttackLoss:
    """Adversarial: steer the attacker toward colliding with the victim
    within a time window (`guidance_loss.py:1691-2105` gptcollision-style
    attack losses, simplified to the core minimize-distance objective)."""

    attacker_ind: int
    victim_ind: int
    time_lo: int = 0
    time_hi: int = 52
    decay_rate: float = 0.9

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        pos_w, _ = _to_world(x, ctx.world_from_agent)
        # victim trajectory is fixed (not steered by the attack)
        victim = jax.lax.stop_gradient(pos_w[self.victim_ind])
        # clamp the attack window to the trajectory length (executed
        # closed-loop trajectories can be shorter than the plan horizon)
        T = x.shape[-2]
        lo = min(self.time_lo, T - 1)
        hi = max(min(self.time_hi, T), lo + 1)
        d = jnp.linalg.norm(
            pos_w[self.attacker_ind, :, lo:hi] - victim[:, lo:hi],
            axis=-1,
        )  # [N, Tw]
        loss = jnp.zeros(x.shape[:2])
        return loss.at[self.attacker_ind].set(jnp.min(d, axis=-1))

    def affected_agents(self):
        return (self.attacker_ind,)


@dataclasses.dataclass(frozen=True)
class SocialGroupLoss:
    """Agents in a social group stay within a preferred distance of the
    group (`guidance_loss.py:1137-1213`, cohesion form: penalize deviation
    of each member's distance-to-centroid from social_dist)."""

    group: Tuple[int, ...]
    social_dist: float = 2.0
    cohesion: float = 0.8

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        pos_w, _ = _to_world(x, ctx.world_from_agent)
        members = jnp.asarray(self.group)
        group_pos = pos_w[members]  # [G, N, T, 2]
        centroid = jnp.mean(group_pos, axis=0, keepdims=True)
        d = jnp.linalg.norm(group_pos - centroid, axis=-1)  # [G, N, T]
        dev = jnp.abs(d - self.social_dist) * self.cohesion
        per_member = jnp.mean(dev, axis=-1)  # [G, N]
        loss = jnp.zeros(x.shape[:2])
        return loss.at[members].set(per_member)

    def affected_agents(self):
        return self.group


@dataclasses.dataclass(frozen=True)
class LaneFollowingLoss:
    """Stay near (and aligned with) the closest lane point
    (`guidance_loss.py:1574-1630` lane_following: per-step distance to the
    projected closest lane point + heading deviation, soft-assigned so the
    choice of lane point stays differentiable)."""

    pos_weight: float = 1.0
    yaw_weight: float = 0.5
    softmin_temp: float = 2.0

    def __call__(self, x, ctx: GuidanceContext, agt_mask=None) -> jnp.ndarray:
        assert ctx.lane_points is not None, "ctx.lane_points required for lane_following"
        lanes = ctx.lane_points  # [B, L, 3]
        avail = (
            ctx.lane_avail if ctx.lane_avail is not None
            else jnp.ones(lanes.shape[:2], dtype=bool)
        )
        pos = x[..., :2]  # [B, N, T, 2]
        yaw = x[..., 3]
        d2 = jnp.sum(
            (pos[:, :, :, None, :] - lanes[:, None, None, :, :2]) ** 2, axis=-1
        )  # [B, N, T, L]
        d = jnp.sqrt(d2 + 1e-9)
        # soft assignment over lane points keeps gradients smooth; masked
        # points get a large FINITE logit penalty (inf would make the
        # 0-weight * inf-distance product NaN under jax.grad)
        am = avail[:, None, None, :]
        w = jax.nn.softmax(-self.softmin_temp * jnp.where(am, d, 1e9), axis=-1)
        pos_dev = jnp.sum(w * jnp.where(am, d, 0.0), axis=-1)  # [B, N, T]
        lane_yaw = jnp.sum(w * jnp.where(am, lanes[:, None, None, :, 2], 0.0), axis=-1)
        from cld_tpu.ops.dynamics import angle_diff

        yaw_dev = jnp.abs(angle_diff(yaw, lane_yaw))
        per_step = self.pos_weight * pos_dev + self.yaw_weight * yaw_dev
        # agents whose scene has no lane points contribute nothing
        has_lane = jnp.any(avail, axis=-1)[:, None, None]
        return jnp.mean(per_step * has_lane, axis=-1)


GUIDANCE_LOSS_MAP = {
    "target_speed": TargetSpeedLoss,
    "agent_collision": AgentCollisionLoss,
    "map_collision": MapCollisionLoss,
    "target_pos_at_time": TargetPosAtTimeLoss,
    "target_pos": TargetPosLoss,
    "global_target_pos_at_time": GlobalTargetPosAtTimeLoss,
    "global_target_pos": GlobalTargetPosLoss,
    "acc_limit": AccLimitLoss,
    "speed_limit": SpeedLimitLoss,
    "stop_sign": StopSignLoss,
    "global_stop_sign": GlobalStopSignLoss,
    "keep_distance": KeepDistanceLoss,
    "collision_attack": CollisionAttackLoss,
    "social_group": SocialGroupLoss,
    "lane_following": LaneFollowingLoss,
    # reference aliases (GUIDANCE_FUNC_MAP, guidance_loss.py:2087-2103):
    # 'gptcollision' -> CollisionLoss, 'gptkeepdistance' -> KeepDistanceLoss;
    # 'gpt' (LLM-generated losses) is handled by cld_tpu.guidance.codegen
    "gptcollision": CollisionAttackLoss,
    "gptkeepdistance": KeepDistanceLoss,
}


def make_guidance_losses(configs: Sequence[Dict]) -> list:
    """Instantiate losses from reference-style config dicts
    ({'name', 'weight', 'params', 'agents'})."""
    out = []
    for cfg in configs:
        cls = GUIDANCE_LOSS_MAP[cfg["name"]]
        out.append((cls(**cfg.get("params", {})), cfg.get("weight", 1.0), cfg.get("agents")))
    return out
