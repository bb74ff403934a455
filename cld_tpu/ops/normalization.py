"""Trajectory normalization with the nuScenes coefficients of record.

Parity with `VaeModel.scale_traj/descale_traj`
(`/root/reference/models/vae/vae_model.py:131-173`) and the coefficients in
`/root/reference/config.yaml:161-164` (nusc_norm_info.diffuser, standardized
agent-centric data). Coefficients are baked as module constants so they are
jit-time constants, not traced operands.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

# (x, y, vel, yaw, acc, yawvel) — mean ("add") and std ("div") coefficients.
NUSC_NORM_ADD = np.array(
    [13.162, -0.13891, 5.0223, -0.0046415, -0.0080072, -0.0013546], dtype=np.float32
)
NUSC_NORM_DIV = np.array(
    [13.0717, 2.2462, 3.6187, 0.2210, 2.5770, 0.0840], dtype=np.float32
)


class TrajNormalizer:
    """Scale/descale trajectories channel-wise: scaled = (x - add) / div."""

    def __init__(self, add_coeffs=NUSC_NORM_ADD, div_coeffs=NUSC_NORM_DIV):
        self.add_coeffs = np.asarray(add_coeffs, dtype=np.float32)
        self.div_coeffs = np.asarray(div_coeffs, dtype=np.float32)

    def scale(self, traj: jnp.ndarray, chosen_inds: Sequence[int] = ()) -> jnp.ndarray:
        inds = list(chosen_inds) if len(chosen_inds) else list(range(len(self.add_coeffs)))
        add = jnp.asarray(self.add_coeffs[inds])
        div = jnp.asarray(self.div_coeffs[inds])
        return (traj - add) / div

    def descale(self, traj: jnp.ndarray, chosen_inds: Sequence[int] = ()) -> jnp.ndarray:
        inds = list(chosen_inds) if len(chosen_inds) else list(range(len(self.add_coeffs)))
        add = jnp.asarray(self.add_coeffs[inds])
        div = jnp.asarray(self.div_coeffs[inds])
        return traj * div + add
