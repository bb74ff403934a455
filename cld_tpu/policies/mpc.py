"""Finite-time optimal control (MPC) — the FTOCP family.

Capability parity with `/root/reference/src/tbsim/utils/ftocp.py:6-160`
(`FTOCP.buildandsolve`) and the `ModelPredictiveController` policy
(`policies/hardcoded.py:666-735`). The reference formulates a casadi NLP —
M contingency branches sharing the first control, Euler unicycle dynamics
constraints, velocity-dependent steering limits, elliptical obstacle keep-out
with 1e6-cost slack — and solves it per agent on the host with IPOPT
(seconds per solve). TPU-native re-design: the same objective becomes a
penalty-form differentiable cost over the control variables (u0 shared +
per-branch sequences), minimized with a fixed-iteration Adam loop under jit
and vmapped over agents — every constraint is the reference's slack term.
Identical cost constants (cost_x=1, cost_y=5, cost_v=1, cost_acc=0.5,
cost_ste=2.0, slack=1e6; ftocp.py:106-113).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.policies.common import Action


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    N: int = 20  # horizon (planning steps)
    M: int = 1  # contingency branches (1 = plain MPC)
    dt: float = 0.1
    max_steer: float = 0.5
    max_yawvel: float = 8.0
    acce_bound: Tuple[float, float] = (-6.0, 4.0)
    vbound: Tuple[float, float] = (-5.0, 40.0)
    # cost constants (ftocp.py:106-113)
    cost_x: float = 1.0
    cost_y: float = 5.0
    cost_v: float = 1.0
    cost_acc: float = 0.5
    cost_ste: float = 2.0
    cost_slack: float = 1e6
    # penalty weight for the hard-bound constraints IPOPT enforces exactly
    cost_bound: float = 1e4
    iters: int = 100
    lr: float = 0.2


def _smoothmax(x, y, gamma: float = 10.0):
    """softmax(x, y) from ftocp.py:163-166: the softmax-WEIGHTED MEAN
    (exp(gx)*x + exp(gy)*y)/(exp(gx) + exp(gy)) — always <= max(x, y),
    unlike log-sum-exp which overshoots near the crossover. Stabilized by
    subtracting the max exponent."""
    gx, gy = gamma * x, gamma * y
    m = jnp.maximum(gx, gy)
    ex = jnp.exp(gx - m)
    ey = jnp.exp(gy - m)
    return (ex * x + ey * y) / (ex + ey)


def _rollout_branch(x0, u0, ubr, dt):
    """Euler unicycle rollout matching the FTOCP dynamics constraints
    (ftocp.py:69-78): x_{k+1} = x_k + dt*(v cos yaw, v sin yaw, a, yawvel).
    u0 [2] shared first control; ubr [N-1, 2]. Returns states [N, 4]."""
    u_all = jnp.concatenate([u0[None], ubr], axis=0)  # [N, 2]

    def step(x, u):
        nxt = x + dt * jnp.array(
            [x[2] * jnp.cos(x[3]), x[2] * jnp.sin(x[3]), u[0], u[1]]
        )
        return nxt, nxt

    _, xs = jax.lax.scan(step, x0, u_all)
    return xs  # [N, 4]


def ftocp_solve(
    cfg: MPCConfig,
    x0: jnp.ndarray,  # [4] current (x, y, v, yaw)
    ypreds: jnp.ndarray,  # [Nobs, M, N, 2] predicted obstacle positions
    obs_mask: jnp.ndarray,  # [Nobs] bool: which obstacle rows are real
    agent_extent: jnp.ndarray,  # [Nobs, 2] (length, width)
    ego_extent: jnp.ndarray,  # [2] (length L, width W)
    xdes: jnp.ndarray,  # [N, 3+] desired (x, y, v[, yaw])
    mode_weights: jnp.ndarray,  # [M] branch weights w
    u_init: Optional[jnp.ndarray] = None,  # [M, N, 2] warm start
) -> Dict[str, jnp.ndarray]:
    """Solve one agent's contingency MPC. Returns xbr [M, N, 4], u0 [2],
    ubr [M, N-1, 2], cost, and max_violation (feasibility proxy — the
    reference's `feasible` flag is violation ~ 0)."""
    N, M = cfg.N, cfg.M
    L, W = ego_extent[0], ego_extent[1]
    u_lb = jnp.array([cfg.acce_bound[0], -cfg.max_steer * cfg.vbound[1]])
    u_ub = jnp.array([cfg.acce_bound[1], cfg.max_steer * cfg.vbound[1]])

    def clip_u(u):
        return jnp.clip(u, u_lb, u_ub)

    def unpack(z):
        u0 = z[:2]
        ubr = z[2:].reshape(M, N - 1, 2)
        return clip_u(u0), clip_u(ubr)

    # semi-axes of the keep-out ellipse (ftocp.py:99-101)
    ax = (L / 1.414 + agent_extent[:, 0] / 1.414) ** 2  # [Nobs]
    ay = (W / 1.414 + agent_extent[:, 1] / 1.414) ** 2

    def penalties(xs, u_all):
        """Constraint violations for one branch: steering/yawvel limits
        (ftocp.py:81-91), velocity bounds, obstacle ellipses (:96-101)."""
        v = xs[:, 2]  # [N]
        steer_lim = _smoothmax(v, 1.0) * cfg.max_steer
        p_steer = jnp.sum(jax.nn.relu(jnp.abs(u_all[:, 1]) - steer_lim) ** 2)
        p_yawvel = jnp.sum(jax.nn.relu(jnp.abs(u_all[:, 1] * v) - cfg.max_yawvel) ** 2)
        p_v = jnp.sum(
            jax.nn.relu(cfg.vbound[0] - v) ** 2 + jax.nn.relu(v - cfg.vbound[1]) ** 2
        )
        return cfg.cost_bound * (p_steer + p_yawvel + p_v)

    def obstacle_slack(xs, ypred_b):
        """Slack needed to satisfy the ellipse constraint >= 1
        (ftocp.py:96-113): relu(1 - e) is exactly the reference's optimal
        slack value, costed at cost_slack. Returns (sum, per-step max)."""
        d = xs[None, :, :2] - ypred_b  # [Nobs, N, 2]
        e = d[..., 0] ** 2 / ax[:, None] + d[..., 1] ** 2 / ay[:, None]
        slack = jax.nn.relu(1.0 - e) * obs_mask[:, None]
        return jnp.sum(slack), jnp.max(slack)

    Q = jnp.array([cfg.cost_x, cfg.cost_y, cfg.cost_v])
    R = jnp.array([cfg.cost_acc, cfg.cost_ste])

    def total_cost(z):
        u0, ubr = unpack(z)
        cost = jnp.sum(u0**2 * R)
        viol = 0.0
        for i in range(M):  # M is small & static (1-3 branches)
            xs = _rollout_branch(x0, u0, ubr[i], cfg.dt)
            u_all = jnp.concatenate([u0[None], ubr[i]], axis=0)
            track = jnp.sum((xs[:, :3] - xdes[:, :3]) ** 2 * Q[None])
            ctrl = jnp.sum(ubr[i] ** 2 * R[None])
            slack, slack_max = obstacle_slack(xs, ypreds[:, i])
            cost = cost + mode_weights[i] * (
                track + ctrl + cfg.cost_slack * slack
            ) + penalties(xs, u_all)
            viol = jnp.maximum(viol, slack_max)
        return cost, viol

    if u_init is None:
        z = jnp.zeros(2 + M * (N - 1) * 2)
    else:
        z = jnp.concatenate([u_init[0, 0], u_init[:, 1:].reshape(-1)])

    grad_fn = jax.grad(lambda z: total_cost(z)[0])

    def adam_step(carry, _):
        z, m, v, t = carry
        g = grad_fn(z)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g**2
        mh = m / (1 - 0.9**t)
        vh = v / (1 - 0.999**t)
        z = z - cfg.lr * mh / (jnp.sqrt(vh) + 1e-8)
        return (z, m, v, t + 1), None

    (z, _, _, _), _ = jax.lax.scan(
        adam_step, (z, jnp.zeros_like(z), jnp.zeros_like(z), 1.0), None,
        length=cfg.iters,
    )

    u0, ubr = unpack(z)
    xbr = jnp.stack([_rollout_branch(x0, u0, ubr[i], cfg.dt) for i in range(M)])
    cost, viol = total_cost(z)
    return {
        "xbr": xbr,  # [M, N, 4]
        "u0": u0,
        "ubr": ubr,
        "cost": cost,
        "max_violation": viol,  # worst per-step ellipse slack (0 = feasible)
        "feasible": viol < 1e-2,
    }


def lane_ref(
    lane_points: jnp.ndarray,  # [L, 3] agent-frame (x, y, yaw), masked
    lane_avail: jnp.ndarray,  # [L] bool
    pos: jnp.ndarray,  # [2] current position (agent frame: origin)
    vdes: jnp.ndarray,  # desired speed (scalar)
    N: int,
    dt: float,
) -> jnp.ndarray:
    """Desired trajectory along the lane — static-shape `obtain_ref`
    (`planning_utils.py:389-433`): for each future step's arc target
    s_k = vdes*k*dt, pick the lane point whose chord distance from the
    projection point best matches s_k (soft-assigned), yielding ([N, 3]
    (x, y, v), usable [] bool). ``usable`` is False when no available lane
    point lies ahead (agent past the lane end) — callers fall back to the
    straight reference then. Masked rows may carry NaN/inf padding; they
    are zero-filled before any arithmetic (0 * NaN would poison the
    soft-assignment matmul)."""
    lane_points = jnp.where(lane_avail[:, None], lane_points, 0.0)
    d0 = jnp.linalg.norm(lane_points[:, :2] - pos[None], axis=-1)
    d0 = jnp.where(lane_avail, d0, jnp.inf)
    i0 = jnp.argmin(d0)
    p0 = lane_points[i0, :2]
    chord = jnp.linalg.norm(lane_points[:, :2] - p0[None], axis=-1)  # [L]
    # only points ahead along the lane direction count
    t_hat = jnp.stack([jnp.cos(lane_points[i0, 2]), jnp.sin(lane_points[i0, 2])])
    ahead = jnp.einsum("ld,d->l", lane_points[:, :2] - p0[None], t_hat) >= 0
    ok = lane_avail & ahead
    s_tgt = vdes * jnp.arange(1, N + 1) * dt  # [N]
    err = jnp.abs(chord[None] - s_tgt[:, None])  # [N, L]
    err = jnp.where(ok[None], err, 1e9)
    w = jax.nn.softmax(-4.0 * err, axis=-1)
    xy = w @ lane_points[:, :2]  # [N, 2]
    ref = jnp.concatenate([xy, jnp.full((N, 1), vdes)], axis=-1)
    return ref, jnp.any(ok)


def _cv_predict_neighbors(obs: TrafficBatch, N: int, dt: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Constant-velocity neighbor predictions from history — the stand-in
    for the reference's learned `predictor.get_prediction`
    (hardcoded.py:681). Returns ([B, S, N, 2], mask [B, S])."""
    hist = obs.all_other_agents_history_positions  # [B, S, Th, 2]
    av = obs.all_other_agents_history_availability > 0  # [B, S, Th]
    last = hist[:, :, -1]
    prev = hist[:, :, -2]
    vel = jnp.where(
        (av[:, :, -1] & av[:, :, -2])[..., None], (last - prev) / dt, 0.0
    )
    t = jnp.arange(1, N + 1, dtype=jnp.float32) * dt
    pred = last[:, :, None] + vel[:, :, None] * t[None, None, :, None]
    mask = av[:, :, -1]
    return pred, mask


def mpc_policy(cfg: MPCConfig = MPCConfig(), vdes_bounds: Tuple[float, float] = (2.0, 25.0)):
    """Build the MPC policy `(obs, rng) -> Action`
    (`ModelPredictiveController.get_action`, hardcoded.py:677-735): desired
    trajectory from the ego lane when available, else a straight
    constant-speed ref in the current heading; obstacles from CV neighbor
    predictions; one `ftocp_solve` per agent, vmapped."""

    def policy(obs: TrafficBatch, rng) -> Action:
        B = obs.curr_speed.shape[0]
        curr = get_current_states(obs)  # [B, 4] (agent frame: ~0,0,v,0)
        N, dt = cfg.N, cfg.dt
        vdes = jnp.clip(curr[:, 2], *vdes_bounds)

        # straight constant-speed reference: the fallback whenever no lane
        # context exists OR an agent has no usable lane point ahead
        s1 = vdes[:, None] * jnp.arange(1, N + 1)[None] * dt  # [B, N]
        xdes = jnp.stack(
            [
                curr[:, 0:1] + jnp.cos(curr[:, 3:4]) * s1,
                curr[:, 1:2] + jnp.sin(curr[:, 3:4]) * s1,
                jnp.broadcast_to(vdes[:, None], s1.shape),
            ],
            axis=-1,
        )
        if obs.lane_points is not None:
            la = (
                obs.lane_avail if obs.lane_avail is not None
                else jnp.isfinite(obs.lane_points).all(-1)
            )
            lane_xdes, usable = jax.vmap(
                lambda lp, av, p, v: lane_ref(lp, av, p, v, N, dt)
            )(obs.lane_points, la, curr[:, :2], vdes)
            xdes = jnp.where(usable[:, None, None], lane_xdes, xdes)

        ypred, mask = _cv_predict_neighbors(obs, N, dt)  # [B, S, N, 2]
        ypred = jnp.repeat(ypred[:, :, None], cfg.M, axis=2)  # [B, S, M, N, 2]
        n_ext = jnp.broadcast_to(
            jnp.array([4.5, 2.0]), ypred.shape[:2] + (2,)
        )
        w = jnp.ones((cfg.M,)) / cfg.M

        sol = jax.vmap(
            lambda x0, yp, m, ne, ee, xd: ftocp_solve(
                cfg, x0, yp, m, ne, ee, xd, w
            )
        )(curr, ypred, mask, n_ext, obs.extent[:, :2], xdes)

        xs = sol["xbr"][:, 0]  # branch 0 plan [B, N, 4]
        u_all = jnp.concatenate([sol["u0"][:, None], sol["ubr"][:, 0]], axis=1)
        return Action(
            positions=xs[..., :2],
            yaws=xs[..., 3:4],
            controls=u_all,
        )

    return policy
