"""Numeric core: dynamics, diffusion math, normalization, geometry, metrics."""

from cld_tpu.ops.dynamics import (
    UnicycleParams,
    unicycle_step,
    unicycle_ubound,
    unicycle_forward_dynamics,
    unicycle_inverse_dyn,
    unicycle_calculate_vel,
    angle_diff,
    convert_state_to_state_and_action,
)
from cld_tpu.ops.diffusion import (
    DiffusionSchedule,
    cosine_beta_schedule,
    make_schedule,
)
from cld_tpu.ops.normalization import TrajNormalizer, NUSC_NORM_ADD, NUSC_NORM_DIV
from cld_tpu.ops.geometry import transform_points, raster_from_agent_matrix
