"""Policy wrappers — functional combinators over `(obs, rng) -> Action`.

Capability parity with `/root/reference/src/tbsim/policies/wrappers.py`:
`PolicyWrapper` (:143, kwargs binder) -> `with_kwargs`;
`RolloutWrapper` (:217, ego vs agents policies) -> `masked_policy`;
`Pos2YawWrapper` (:190) -> `pos2yaw_policy`;
`NewSamplingPolicyWrapper` (:274, guidance-loss filtration over N samples)
-> `guided_sampling_policy`;
`PerturbationWrapper` (:255, Ornstein-Uhlenbeck action noise; OU kernel from
`src/tbsim/utils/metrics.py:631`) -> `ou_perturbation_policy`.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from cld_tpu.guidance.losses import GuidanceContext
from cld_tpu.guidance.perturbation import GuidanceSpec, choose_best_sample
from cld_tpu.ops.dynamics import angle_diff
from cld_tpu.policies.common import Action

PolicyFn = Callable  # (obs, rng) -> Action


def with_kwargs(policy, **kwargs) -> PolicyFn:
    """Bind run-time keyword arguments (`PolicyWrapper.wrap_controller`)."""
    return functools.partial(policy, **kwargs)


def masked_policy(mask: jnp.ndarray, policy_true: PolicyFn, policy_false: PolicyFn) -> PolicyFn:
    """Per-agent policy selection (the flattened-agent equivalent of
    RolloutWrapper's ego/agents split): mask [B] picks policy_true's action
    where True."""

    def policy(obs, rng):
        r1, r2 = jax.random.split(rng)
        a = policy_true(obs, r1)
        b = policy_false(obs, r2)
        # policies may plan different horizons; blend over the common prefix
        T = min(a.positions.shape[-2], b.positions.shape[-2])
        cut = lambda x: None if x is None else x[..., :T, :]
        m = mask.reshape((-1, 1, 1))
        return Action(
            positions=jnp.where(m, cut(a.positions), cut(b.positions)),
            yaws=jnp.where(m, cut(a.yaws), cut(b.yaws)),
            controls=None
            if a.controls is None or b.controls is None
            else jnp.where(m, cut(a.controls), cut(b.controls)),
        )

    return policy


def pos2yaw_policy(policy: PolicyFn, dt: float = 0.1, yaw_correction_speed: float = 1.0) -> PolicyFn:
    """Recompute yaws from positions (`Pos2YawWrapper:190-214` /
    `yaw_from_pos`): heading of the displacement, held when speed is below
    the correction threshold."""

    def wrapped(obs, rng):
        a = policy(obs, rng)
        pos = jnp.concatenate([jnp.zeros_like(a.positions[..., :1, :]), a.positions], axis=-2)
        delta = pos[..., 1:, :] - pos[..., :-1, :]
        speed = jnp.linalg.norm(delta, axis=-1) / dt
        yaw = jnp.arctan2(delta[..., 1], delta[..., 0])[..., None]
        # hold previous yaw when too slow for a reliable heading
        def carry_fn(prev, inp):
            y, ok = inp
            cur = jnp.where(ok, y, prev)
            return cur, cur

        ok = (speed > yaw_correction_speed)[..., None]
        yaw_t = jnp.moveaxis(yaw, -2, 0)
        ok_t = jnp.moveaxis(ok, -2, 0)
        _, yaw_held = jax.lax.scan(carry_fn, jnp.zeros_like(yaw_t[0]), (yaw_t, ok_t))
        return a._replace(yaws=jnp.moveaxis(yaw_held, 0, -2))

    return wrapped


def guided_sampling_policy(
    sampler: Callable,  # (obs, rng) -> trajectories [B, N, T, 6] descaled
    specs: Sequence[GuidanceSpec],
    make_ctx: Callable[[object], GuidanceContext],
) -> PolicyFn:
    """Filtration policy (`NewSamplingPolicyWrapper:274-330`): draw N
    samples, score each with the guidance losses, execute the best."""

    def policy(obs, rng):
        from cld_tpu.guidance.perturbation import is_scene_level_spec

        trajs = sampler(obs, rng)  # [B, N, T, 6]
        ctx = make_ctx(obs)
        total = jnp.zeros(trajs.shape[:2])
        for spec in specs:
            total = total + spec.weight * spec.loss(trajs, ctx, agt_mask=None)
        best, _ = choose_best_sample(
            trajs, total, scene_index=ctx.scene_index,
            scene_level=any(is_scene_level_spec(s) for s in specs),
        )
        return Action(positions=best[..., :2], yaws=best[..., 3:4], controls=best[..., 4:6])

    return policy


def ou_noise(rng, shape, theta: float = 0.8, sigma=(0.0, 0.1, 0.2)) -> jnp.ndarray:
    """Ornstein-Uhlenbeck noise sequence over the time axis
    (`src/tbsim/utils/metrics.py:631-650`). shape [..., T, D]; per-dim sigma."""
    sigma = jnp.asarray(sigma)[: shape[-1]]
    T = shape[-2]
    eps = jax.random.normal(rng, shape)

    def step(prev, e):
        cur = (1 - theta) * prev + e
        return cur, cur

    eps_t = jnp.moveaxis(eps, -2, 0)
    _, out = jax.lax.scan(step, jnp.zeros(shape[:-2] + shape[-1:]), eps_t)
    return jnp.moveaxis(out, 0, -2) * sigma


def hierarchical_policy(planner: PolicyFn, dt: float = 0.1) -> PolicyFn:
    """Planner + tracking-controller composition
    (`HierarchicalWrapper`, `wrappers.py:16-80`): the planner emits a
    position/yaw plan; inverse unicycle dynamics converts it into controls
    relative to the agent's current state (the same inference the data layer
    uses for GT futures). Used when the upstream policy produces plans
    without controls (e.g. GT echo or waypoint planners)."""
    from cld_tpu.ops.dynamics import convert_state_to_state_and_action

    def policy(obs, rng):
        plan = planner(obs, rng)
        if plan.controls is not None:
            return plan
        traj_state = jnp.concatenate([plan.positions, plan.yaws], axis=-1)
        sa = convert_state_to_state_and_action(traj_state, obs.curr_speed, dt)
        return plan._replace(controls=sa[..., 4:6])

    return policy


def ou_perturbation_policy(policy: PolicyFn, theta: float = 0.8, sigma=(0.0, 0.1, 0.2)) -> PolicyFn:
    """Perturb actions with OU noise (`PerturbationWrapper:255-272`): noise on
    (x, y, yaw) channels."""

    def wrapped(obs, rng):
        a_rng, n_rng = jax.random.split(rng)
        a = policy(obs, a_rng)
        noise = ou_noise(n_rng, a.positions.shape[:-1] + (3,), theta, sigma)
        return a._replace(
            positions=a.positions + noise[..., :2],
            yaws=angle_diff(a.yaws + noise[..., 2:3], jnp.zeros_like(a.yaws)),
            controls=None,
        )

    return wrapped
