"""Test-time guidance: the controllability engine.

Pure-cost re-design of the reference's guidance stack
(`/root/reference/src/tbsim/utils/guidance_loss.py:104-2354`): losses are
pure functions over [B, N, T, 6] trajectories, aggregation is static
per-scene masking, and perturbation is functional Adam ascent threaded
through the sampling scan (instead of torch.optim mutating a leaf tensor).
"""

from cld_tpu.guidance.losses import (
    GuidanceContext,
    prepack_drivable,
    TargetSpeedLoss,
    AgentCollisionLoss,
    MapCollisionLoss,
    TargetPosAtTimeLoss,
    TargetPosLoss,
    GlobalTargetPosLoss,
    AccLimitLoss,
    SpeedLimitLoss,
    StopSignLoss,
    GUIDANCE_LOSS_MAP,
    make_guidance_losses,
)
from cld_tpu.guidance.perturbation import (
    GuidanceSpec,
    compute_guidance_loss,
    make_perturbation_guidance,
    choose_best_sample,
)
