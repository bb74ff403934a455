"""Policy layer: action containers, wrappers, hardcoded policies, composers."""

from cld_tpu.policies.common import Action, Plan, action_from_trajectory
from cld_tpu.policies.wrappers import (
    with_kwargs,
    masked_policy,
    pos2yaw_policy,
    guided_sampling_policy,
    ou_perturbation_policy,
)
from cld_tpu.policies.hardcoded import gt_policy, replay_policy, constant_policy
