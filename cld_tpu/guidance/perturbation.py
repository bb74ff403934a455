"""Perturbation guidance: gradient steering of the sampler.

Capability parity with `PerturbationGuidance`
(`/root/reference/src/tbsim/utils/guidance_loss.py:2179-2354`) and
`DiffuserGuidance.compute_guidance_loss` (`:2143-2174`), functional:

* the reference mutates a leaf tensor with `torch.optim.Adam` inside each
  denoise step; here `perturb` is a pure function (x, ctx) -> x' running
  `grad_steps` hand-rolled Adam updates via `jax.grad`, so it nests inside
  the jitted sampling scan;
* `perturb_th` clipping bounds the *cumulative* delta from the initial
  value. NOTE a reference quirk we deliberately do NOT reproduce: in the
  reference's plain `perturb` the clip is dead code — `x_guidance =
  x_initial` aliases and torch.optim mutates in place, so
  `x_guidance - x_initial == 0` always (`:2239,2274-2279`). Our live clip
  follows the `perturb_video_diffusion` path (`:2324-2328`), where
  `x_guidance = x_initial + x_delta` makes the clip effective — the
  intended semantics. A per-step sigma schedule can scale the threshold
  (`models/diffuser.py:875-905` clean-vs-noisy guidance);
* a `decode_fn` indirection supports latent-space guidance: the cost is
  evaluated on the decoded (VAE + unicycle) trajectory while the gradient
  flows back to the latent (the reference's `decoder` argument, `:2240`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cld_tpu.guidance.losses import GuidanceContext, masked_mean


@dataclasses.dataclass(frozen=True)
class GuidanceSpec:
    """One guidance rule: a loss callable + weight + optional agent mask
    (mirrors `GuidanceConfig`, `guidance_loss.py:104-140`)."""

    loss: Callable
    weight: float = 1.0
    agent_mask: Optional[Tuple[bool, ...]] = None  # static [B] mask, None = all


def compute_guidance_loss(
    x_traj: jnp.ndarray, ctx: GuidanceContext, specs: Sequence[GuidanceSpec]
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted sum of per-rule masked means over [B, N, T, 6] trajectories
    (`DiffuserGuidance.compute_guidance_loss`, `guidance_loss.py:2143-2174`)."""
    B = x_traj.shape[0]
    total = jnp.zeros(())
    per_losses: Dict[str, jnp.ndarray] = {}
    for i, spec in enumerate(specs):
        if spec.agent_mask is not None:
            mask = jnp.asarray(spec.agent_mask)
        else:
            mask = jnp.ones((B,), dtype=bool)
        # agent-indexed rules (attack/keep-distance/social-group) embed an
        # (n_affected,)-shaped loss into zero-filled [B, N] rows; the
        # reference means each rule over ITS OWN agents only
        # (`guidance_loss.py:2174`: torch.mean(cur_loss) where cur_loss is
        # the masked rows) — meaning over all B would dilute the rule's
        # gradient by B/n_affected relative to the other rules
        affected = getattr(spec.loss, "affected_agents", None)
        if callable(affected):
            affected = affected()
        if affected is not None:
            aff = np.zeros(B, bool)
            aff[np.asarray(affected, int)] = True
            mask = mask & jnp.asarray(aff)
        cur = spec.loss(x_traj, ctx, agt_mask=mask)  # [B, N]
        per_losses[f"{type(spec.loss).__name__}_{i}"] = cur
        total = total + masked_mean(cur, mask) * spec.weight
    return total, per_losses


def perturb(
    x_initial: jnp.ndarray,
    ctx: GuidanceContext,
    specs: Sequence[GuidanceSpec],
    decode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    lr: float = 0.3,
    grad_steps: int = 1,
    perturb_th: Optional[float | jnp.ndarray] = None,
    optimizer: str = "adam",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Functional Adam/SGD ascent on x minimizing the guidance cost of its
    decoded trajectory (`PerturbationGuidance.perturb`, `:2221-2282`).

    x_initial can be the sampler's posterior mean over latents ([BN, T, D])
    or a raw trajectory; decode_fn maps it to [B, N, T, 6] descaled
    trajectories for the cost.
    """

    def cost(x):
        total, _ = compute_guidance_loss(decode_fn(x), ctx, specs)
        return total

    grad_fn = jax.grad(cost)
    x = x_initial
    m = jnp.zeros_like(x_initial)
    v = jnp.zeros_like(x_initial)
    for step in range(grad_steps):
        g = grad_fn(x)
        if optimizer == "adam":
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g**2
            m_hat = m / (1 - b1 ** (step + 1))
            v_hat = v / (1 - b2 ** (step + 1))
            x = x - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        elif optimizer == "sgd":
            x = x - lr * g
        else:
            raise NotImplementedError(optimizer)
        if perturb_th is not None:
            delta = jnp.clip(x - x_initial, -perturb_th, perturb_th)
            x = x_initial + delta
    return x


def make_perturbation_guidance(
    ctx: GuidanceContext,
    specs: Sequence[GuidanceSpec],
    decode_fn: Callable[[jnp.ndarray], jnp.ndarray],
    lr: Optional[float] = 0.3,
    grad_steps: int = 1,
    perturb_th: Optional[float] = None,
    sigma_schedule: Optional[jnp.ndarray] = None,
    n_timesteps: Optional[int] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build the guidance_fn hook consumed by `cld_tpu.algos.dm.sample_traj`:
    (posterior_mean, t) -> perturbed mean.

    Per-step optimization params follow the reference's intermediate-step
    logic (`models/diffuser.py:884-905` guidance_optimization_params):

    * `perturb_th=None` with a `sigma_schedule` clips the cumulative delta
      to the posterior sigma at step t (the config of record:
      `scene_edit_config.py:79` "when None, sigma is used for Diffuser");
      without a schedule there is no clip;
    * an explicit `perturb_th` with `n_timesteps` set decays sigmoidally
      from ~4 at the start of sampling to `perturb_th` at t=0
      (`sig_scale = (sigmoid(10 t/T) - 1/2) * 2`,
      `th = sig_scale * (4 - perturb_th) + perturb_th`,
      `diffuser.py:890-893`); without `n_timesteps` it is constant;
    * `lr=None` with a `sigma_schedule` uses sigma as the step size
      (`diffuser.py:899-900`).

    sigma_schedule [n_timesteps]: per-step posterior sigmas,
    exp(0.5 * posterior_log_variance_clipped).
    """
    # pre-pack the scan-invariant guidance inputs HERE, the choke point
    # every guided ctx passes through before the sampling scan is traced —
    # callers that forget would otherwise re-pay the drivable bit-pack and
    # the MapCollision [B, P, P] bbox distance cache inside every denoise
    # step (XLA does not hoist either out of while loops; the d2 recompute
    # alone measured 0.065 ms/step at bench scale on v5e). Idempotent when
    # the caller already packed.
    from cld_tpu.guidance.losses import (
        MapCollisionLoss,
        prepack_drivable,
        prepack_map_bbox,
    )

    ctx = prepack_drivable(ctx)
    map_specs = [s for s in specs if isinstance(s.loss, MapCollisionLoss)]
    if map_specs:
        grids = {s.loss.num_points_lw for s in map_specs}
        if len(grids) > 1:
            # ctx carries ONE prepacked grid; a second spec with a different
            # grid would silently recompute per denoise step (correct but
            # the hoisting win is lost) — surface it instead
            raise ValueError(
                "multiple MapCollisionLoss specs with different "
                f"num_points_lw {sorted(grids)}: prepacking supports one "
                "grid per context — unify the specs' num_points_lw"
            )
        # the default "separable" min-dist path (and its "separable_xy"
        # moment-backward twin) never reads the [B, P, P] distance cache;
        # skip computing it unless a rigid/pairwise path of some spec will
        # consume it
        need_d2 = any(
            s.loss.min_dist_impl not in ("separable", "separable_xy", "separable_xy_bf16")
            for s in map_specs
        )
        ctx = prepack_map_bbox(
            ctx, map_specs[0].loss.num_points_lw, with_d2=need_d2
        )

    def guidance_fn(mean: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        step_lr, th = guidance_opt_schedule(
            t[0], lr=lr, perturb_th=perturb_th,
            sigma_schedule=sigma_schedule, n_timesteps=n_timesteps,
        )
        return perturb(
            mean, ctx, specs, decode_fn, lr=step_lr, grad_steps=grad_steps,
            perturb_th=th,
        )

    return guidance_fn


def guidance_opt_schedule(
    t,
    *,
    lr: Optional[float],
    perturb_th: Optional[float],
    sigma_schedule: Optional[jnp.ndarray],
    n_timesteps: Optional[int],
):
    """Per-step (step_lr, perturb_th) of the reference's intermediate-step
    guidance-optimization scheduling block (`models/diffuser.py:884-905`):

    * perturb_th None -> th = posterior sigma at t (None without a schedule);
    * explicit perturb_th with n_timesteps -> sigmoid decay from ~4 at the
      start of sampling down to perturb_th at t=0
      (`sig_scale = (sigmoid(10 t/T) - 1/2) * 2`,
      `th = sig_scale * (4 - perturb_th) + perturb_th`);
    * lr None -> lr = sigma (requires a schedule).

    Exposed standalone so the exact per-step series can be parity-tested
    against the reference's p_sample scheduling code
    (tests/test_e2e_parity.py). `t` is a scalar (traced or concrete).
    """
    if perturb_th is None:
        th = None if sigma_schedule is None else sigma_schedule[t]
    elif n_timesteps is not None:
        tf = jnp.asarray(t).astype(jnp.float32)
        sig_scale = (jax.nn.sigmoid(10.0 * tf / n_timesteps) - 0.5) * 2.0
        th = sig_scale * (4.0 - perturb_th) + perturb_th
    else:
        th = perturb_th
    step_lr = lr
    if step_lr is None:
        if sigma_schedule is None:
            raise ValueError("lr=None needs a sigma_schedule (lr = sigma)")
        step_lr = sigma_schedule[t]
    return step_lr, th


def per_sample_guidance_loss(
    x_traj: jnp.ndarray, ctx: GuidanceContext, specs: Sequence[GuidanceSpec]
) -> jnp.ndarray:
    """Total weighted guidance loss PER (agent, sample): [B, N, T, 6] ->
    [B, N]. This is the filtration score the reference computes through
    `compute_guidance_loss`'s per-sample dict and consumes in
    `choose_action_from_guidance` (`guidance_loss.py:22-60`,
    `algos/algos.py:2024-2100`); agents outside a rule's mask contribute 0
    for that rule."""
    B, N = x_traj.shape[:2]
    total = jnp.zeros((B, N))
    for spec in specs:
        cur = spec.loss(x_traj, ctx, agt_mask=None)  # [B, N]
        if spec.agent_mask is not None:
            cur = jnp.where(jnp.asarray(spec.agent_mask)[:, None], cur, 0.0)
        total = total + spec.weight * cur
    return total


def choose_closest_to_gt(
    samples: jnp.ndarray,
    positions: jnp.ndarray,
    gt_positions: jnp.ndarray,
    gt_avail: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """guide_with_gt selection: pick the sample whose positions are closest
    to the observation's GT future (`choose_action_from_gt`,
    `guidance_loss.py:67-100`; wired via the composer's guide_with_gt,
    `dm_composer.py:6-34`). Availability-masked mean Euclidean position
    error (ADE); agents with no valid GT keep sample 0 (the reference's
    fallback).

    samples [B, N, ...], positions [B, N, T, 2], gt_positions [B, T, 2],
    gt_avail [B, T] -> ([B, ...], [B] indices).
    """
    av = gt_avail.astype(positions.dtype)
    # per-step EUCLIDEAN error -> masked mean = the reference's ADE
    # (torch.norm + nanmean, guidance_loss.py:90-92) — mean SQUARED error
    # ranks unevenly-distributed errors differently and picks other samples
    err = jnp.linalg.norm(positions - gt_positions[:, None], axis=-1)  # [B, N, T]
    denom = jnp.maximum(jnp.sum(av, axis=-1), 1.0)
    ade = jnp.sum(err * av[:, None], axis=-1) / denom[:, None]  # [B, N]
    idx = jnp.where(jnp.sum(av, axis=-1) > 0, jnp.argmin(ade, axis=-1), 0)
    best = jnp.take_along_axis(
        samples, idx.reshape((-1, 1) + (1,) * (samples.ndim - 2)), axis=1
    )[:, 0]
    return best, idx


def choose_best_sample(
    samples: jnp.ndarray,
    guide_losses: jnp.ndarray,
    scene_index: Optional[jnp.ndarray] = None,
    scene_level: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Filtration: pick the sample with the lowest total guidance loss
    (`choose_action_from_guidance`, `guidance_loss.py:22-64`).

    Per-agent independent argmin by default. When `scene_level` is True
    (any scene-coupled rule — agent_collision / social_group /
    gptcollision / gptkeepdistance — is active, `guidance_loss.py:49-56`),
    each SCENE picks ONE shared sample index by argmin of the
    agent-summed loss: pair losses score sample n under the assumption
    that every agent in the scene plays sample n, so per-agent
    independent picks would execute trajectory combinations that were
    never scored.

    samples [B, N, ...], guide_losses [B, N], scene_index [B] int ->
    ([B, ...], [B] indices).
    """
    if scene_level and scene_index is not None:
        B = guide_losses.shape[0]
        per_scene = jax.ops.segment_sum(
            guide_losses, scene_index, num_segments=B
        )  # [B(seg), N]; unused segment rows are all-zero and never read
        idx = jnp.argmin(per_scene, axis=-1)[scene_index]  # [B]
    else:
        idx = jnp.argmin(guide_losses, axis=-1)  # [B]
    best = jnp.take_along_axis(
        samples, idx.reshape((-1, 1) + (1,) * (samples.ndim - 2)), axis=1
    )[:, 0]
    return best, idx


# rules whose per-sample loss couples agents within a scene — filtration
# must then share one sample index per scene (reference name list at
# `guidance_loss.py:49-50`: agent_collision, social_group, gptcollision,
# gptkeepdistance)
def is_scene_level_spec(spec: GuidanceSpec) -> bool:
    from cld_tpu.guidance.losses import (
        AgentCollisionLoss,
        CollisionAttackLoss,
        KeepDistanceLoss,
        SocialGroupLoss,
    )

    return isinstance(
        spec.loss,
        (AgentCollisionLoss, CollisionAttackLoss, KeepDistanceLoss, SocialGroupLoss),
    )
