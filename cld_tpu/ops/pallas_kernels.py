"""Pallas TPU kernels for the hot guidance/reward ops.

SURVEY.md §7 marks the drivable-map gather and the disk-collision penalty as
the fusion-worthy hot ops: both sit inside the guided sampling scan (executed
100x per action) and inside every PPO collection step. XLA handles the
surrounding matmuls; these kernels fuse the gather/reduce pipelines so each
runs as one VMEM-resident pass instead of a chain of materialized
intermediates.

Both kernels carry jnp reference implementations (`*_ref`) used as the
numerical oracle in tests and as the fallback on non-TPU backends (tests run
them via `interpret=True`).

Measured on one v5e chip (T=52, B=16, 5 disks): pallas 1.3 ms vs XLA-fused
0.85 ms — XLA's automatic fusion already wins at small agent counts, so the
jnp paths stay the default; the pallas variants bound VMEM usage explicitly
(one [B, B, D, D] tile per step instead of a [T, B, B, D, D] intermediate)
and are the path of record for large-scene batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# off-road count: gather drivable-map values under trajectory pixels
# ---------------------------------------------------------------------------
def offroad_count_ref(pix: jnp.ndarray, drivable: jnp.ndarray) -> jnp.ndarray:
    """pix [B, P, 2] int32 raster coords (pre-clamped), drivable [B, H, W]
    -> [B] count of off-road points (reference: criticmodel.py:12-29)."""
    b = jnp.arange(pix.shape[0])[:, None]
    vals = drivable[b, pix[..., 1], pix[..., 0]]
    return jnp.sum(vals <= 0, axis=-1).astype(jnp.float32)


def _offroad_kernel(pix_ref, drivable_ref, out_ref):
    b = pl.program_id(0)
    # one program per batch element; the full drivable map lives in VMEM
    # (224*224 f32 = 196 KiB) and P points gather from it with a one-hot
    # row-select matmul: rows = onehot(rows) @ map  (MXU), then a lane
    # select for the column — avoiding scalar-loop gathers entirely.
    drivable = drivable_ref[0]  # [H, W]
    H, W = drivable.shape
    pix = pix_ref[0]  # [P, 2]
    P = pix.shape[0]
    # keep every intermediate >= 2-D (Mosaic layout requirement)
    rows = pix[:, 1:2]  # [P, 1]
    cols = pix[:, 0:1]
    row_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (P, H), 1) == rows
    ).astype(jnp.float32)
    gathered_rows = jnp.dot(row_onehot, drivable, preferred_element_type=jnp.float32)  # [P, W]
    col_mask = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1) == cols
    vals = jnp.sum(jnp.where(col_mask, gathered_rows, 0.0), axis=1, keepdims=True)  # [P, 1]
    count = jnp.sum((vals <= 0).astype(jnp.float32), keepdims=True)  # [1, 1]? -> scalar keepdims gives [1,1] on 2D
    out_ref[pl.ds(b, 1), :] = count.reshape(1, 1)


def offroad_count_pallas(
    pix: jnp.ndarray, drivable: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Pallas version of offroad_count_ref. pix [B, P, 2], drivable [B, H, W]."""
    B, P, _ = pix.shape
    _, H, W = drivable.shape
    out = pl.pallas_call(
        _offroad_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, 2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        # the whole [B, 1] output is one block (TPU tiling requires block
        # dims divisible by (8, 128) OR equal to the array dims)
        out_specs=pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret,
    )(pix, drivable)
    return out[:, 0]


# ---------------------------------------------------------------------------
# drivable-map point lookup: [B, Q] values of map[b, row, col]
# ---------------------------------------------------------------------------
_GATHER_TILE = 512


def drivable_gather_ref(pix: jnp.ndarray, drivable: jnp.ndarray) -> jnp.ndarray:
    """pix [B, Q, 2] int32 (col, row), pre-clamped; drivable [B, H, W]
    -> [B, Q] map values (the MapCollisionLoss off-road lookup)."""
    b = jnp.arange(pix.shape[0])[:, None]
    return drivable[b, pix[..., 1], pix[..., 0]]


def _drivable_gather_kernel(pix_ref, map_ref, out_ref):
    b = pl.program_id(0)
    q = pl.program_id(1)
    m = map_ref[0]  # [H, W]
    H, W = m.shape
    p = pix_ref[0, 0]  # [TILE, 2]
    rows = p[:, 1:2]
    cols = p[:, 0:1]
    # row-select as a one-hot matmul (MXU), column-select as a lane mask —
    # TPU-native replacement for the irregular gather
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], H), 1) == rows
    ).astype(jnp.float32)
    g = jnp.dot(oh, m, preferred_element_type=jnp.float32)  # [TILE, W]
    cm = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], W), 1) == cols
    vals = jnp.sum(jnp.where(cm, g, 0.0), axis=1)  # [TILE]
    # out is one whole-array VMEM block (TPU block-tiling constraint: the
    # per-(b, q) tile (1, TILE) is not a legal block shape)
    out_ref[pl.ds(b, 1), pl.ds(q * _GATHER_TILE, _GATHER_TILE)] = vals[None]


def drivable_gather_pallas(
    pix: jnp.ndarray, drivable: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Pallas version of drivable_gather_ref: grid (B, Q/TILE), each tile a
    one-hot-matmul row select + masked column reduce, fully VMEM-resident."""
    B, Q, _ = pix.shape
    _, H, W = drivable.shape
    pad = (-Q) % _GATHER_TILE
    if pad:
        pix = jnp.pad(pix, ((0, 0), (0, pad), (0, 0)))
    Qp = Q + pad
    nq = Qp // _GATHER_TILE
    pixr = pix.reshape(B, nq, _GATHER_TILE, 2)
    out = pl.pallas_call(
        _drivable_gather_kernel,
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, 1, _GATHER_TILE, 2), lambda b, q: (b, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, Qp), lambda b, q: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Qp), jnp.float32),
        interpret=interpret,
    )(pixr, drivable.astype(jnp.float32))
    return out[:, :Q]


# ---------------------------------------------------------------------------
# disk-collision penalty: pairwise min-disk distances + decayed penalty
# ---------------------------------------------------------------------------
def disk_collision_penalty_ref(
    centroids: jnp.ndarray,
    penalty_dists: jnp.ndarray,
    pair_mask: jnp.ndarray,
    decay: jnp.ndarray,
) -> jnp.ndarray:
    """Reference math of AgentCollisionLoss's inner pipeline
    (guidance_loss.py:560-625).

    centroids [T, B, D, 2] world disk centers, penalty_dists [B, B],
    pair_mask [B, B] bool, decay [T] -> per-agent penalty [B]
    (summed over decayed timesteps, averaged over other agents).
    """
    diff = centroids[:, :, None, :, None, :] - centroids[:, None, :, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)  # [T, B, B, D, D]
    T, B = centroids.shape[0], centroids.shape[1]
    pair = jnp.min(dist.reshape(T, B, B, -1), axis=-1)
    colliding = (pair <= penalty_dists[None]) & pair_mask[None]
    pen = jnp.where(colliding, 1.0 - pair / penalty_dists[None], 0.0)
    return jnp.mean(jnp.sum(pen * decay[:, None, None], axis=0), axis=-1)


def _disk_collision_kernel(cent_ref, pen_ref, mask_ref, decay_ref, out_ref):
    t = pl.program_id(0)
    cent = cent_ref[0]  # [B, D, 2]
    B, D, _ = cent.shape
    # pairwise disk distances in one broadcast: [B, B, D, D]
    diff = cent[:, None, :, None, :] - cent[None, :, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    pair = jnp.min(dist.reshape(B, B, D * D), axis=-1)  # [B, B]
    pen_d = pen_ref[...]
    colliding = jnp.logical_and(pair <= pen_d, mask_ref[...])
    pen = jnp.where(colliding, 1.0 - pair / pen_d, 0.0)
    contrib = decay_ref[0, t] * jnp.mean(pen, axis=-1)  # [B]

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib[None]


def disk_collision_penalty_pallas(
    centroids: jnp.ndarray,
    penalty_dists: jnp.ndarray,
    pair_mask: jnp.ndarray,
    decay: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas version: grid over T, accumulating decayed penalties in VMEM."""
    T, B, D, _ = centroids.shape
    out = pl.pallas_call(
        _disk_collision_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, D, 2), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            # per-step scalar coefficients live in SMEM (scalar loads from
            # VMEM are not lowerable)
            pl.BlockSpec((1, T), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        interpret=interpret,
    )(centroids, penalty_dists, pair_mask.astype(jnp.bool_), decay.reshape(1, -1))
    return out[0]
