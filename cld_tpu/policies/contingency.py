"""Sampling-based contingency planning over trajectory trees.

Capability parity with `/root/reference/src/tbsim/utils/planning_utils.py`
(`ego_sample_planning:128`, `tiled_to_tree:230`, `contingency_planning:259`,
`TreeMotionPolicy:169`) and the `ContingencyPlanner` / `SamplingPolicy`
policies (`policies/hardcoded.py:286,540`). The reference builds Python tree
objects (AgentTrajTree) and runs the stage-wise dynamic program with dicts
keyed by node pairs on the host. TPU-native re-design: trees stay in tiled
dense form (`[K^S, T, ...]` for an S-stage, K-branching ego tree; `[M^S, ...]`
for the scenario tree) and the DP is a static Python loop over stages of
dense `[K^t, M^t]` value tables — reshape + min/expectation reductions only,
so the whole plan jits and vmaps over agents.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cld_tpu.algos.reward import drivable_values_at
from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.ops.dynamics import UnicycleParams, unicycle_forward_dynamics
from cld_tpu.policies.common import Action


def collision_cost(
    ego_pos: jnp.ndarray,  # [..., T, 2]
    ego_extent: jnp.ndarray,  # [2]
    agent_pos: jnp.ndarray,  # [..., Nobs, T, 2]
    agent_extent: jnp.ndarray,  # [Nobs, 2]
    agent_mask: jnp.ndarray,  # [Nobs]
) -> jnp.ndarray:
    """Soft collision cost max_t sigmoid(-4 * clearance) — the disk form of
    `get_collision_loss` (`planning_utils.py:27-60`, sigmoid(-dis*4) with
    max over time)."""
    d = jnp.linalg.norm(ego_pos[..., None, :, :] - agent_pos, axis=-1)  # [..., Nobs, T]
    rad = (ego_extent[0] + agent_extent[:, 0]) / 2.0  # [Nobs]
    clearance = d - rad[..., :, None]
    per = jax.nn.sigmoid(-clearance * 4.0) * agent_mask[..., :, None]
    return jnp.max(per, axis=(-1, -2))


def drivable_cost(
    ego_pos: jnp.ndarray,  # [K, T, 2] (one agent's candidates)
    drivable_map: jnp.ndarray,  # [H, W]
    raster_from_agent: jnp.ndarray,  # [3, 3]
) -> jnp.ndarray:
    """Off-road fraction of each candidate (`get_drivable_area_loss`,
    planning_utils.py:62-82, without the host distance transform: the
    indicator is the penalty)."""
    vals = drivable_values_at(
        ego_pos[None], drivable_map[None], raster_from_agent[None]
    )[0]
    return jnp.mean(1.0 - vals, axis=-1)


def progress_reward(ego_pos: jnp.ndarray, d_sat: jnp.ndarray) -> jnp.ndarray:
    """Saturated total travelled distance (`get_progress_reward` +
    `get_total_distance`, planning_utils.py:113-126)."""
    seg = jnp.linalg.norm(jnp.diff(ego_pos, axis=-2), axis=-1).sum(-1)
    return jnp.minimum(seg, d_sat) / jnp.clip(d_sat, 1e-3)


def ego_sample_planning(
    ego_trajs: jnp.ndarray,  # [B, K, T, 3] candidate (x, y, yaw)
    agent_traj: jnp.ndarray,  # [B, Nobs, T, 2]
    ego_extent: jnp.ndarray,  # [B, 2]
    agent_extent: jnp.ndarray,  # [B, Nobs, 2]
    agent_mask: jnp.ndarray,  # [B, Nobs]
    drivable_map: jnp.ndarray,  # [B, H, W]
    raster_from_agent: jnp.ndarray,  # [B, 3, 3]
    weights: Dict[str, float],
    log_likelihood: Optional[jnp.ndarray] = None,  # [B, K]
) -> jnp.ndarray:
    """Pick the best candidate per agent (`ego_sample_planning`,
    planning_utils.py:128-166): argmax of likelihood + progress - collision
    - lane costs. Returns [B] indices."""
    col = jax.vmap(collision_cost)(
        ego_trajs[..., :2], ego_extent, agent_traj, agent_extent, agent_mask
    )  # [B, K]
    lane = jax.vmap(drivable_cost)(
        ego_trajs[..., :2], drivable_map, raster_from_agent
    )
    prog = jnp.linalg.norm(
        jnp.diff(ego_trajs[..., :2], axis=-2), axis=-1
    ).sum(-1)
    ll = jnp.zeros_like(col) if log_likelihood is None else log_likelihood
    score = (
        weights.get("likelihood_weight", 0.0) * ll
        + weights.get("progress_weight", 0.0) * prog
        - weights.get("collision_weight", 1.0) * col
        - weights.get("lane_weight", 1.0) * lane
    )
    return jnp.argmax(score, axis=-1)


@dataclasses.dataclass(frozen=True)
class ContingencyConfig:
    stages: int = 2  # S tree layers
    frames_per_stage: int = 10  # F
    target_speeds: Tuple[float, ...] = (0.0, 5.0, 10.0)
    yawvels: Tuple[float, ...] = (-0.2, 0.0, 0.2)
    num_modes: int = 2  # Ma: scenario branching per stage
    dt: float = 0.1
    w_collision: float = 10.0
    w_lane: float = 1.0
    w_progress: float = 1.0
    speed_gain: float = 1.0
    dyn: UnicycleParams = UnicycleParams(
        max_steer=0.5, max_yawvel=6.283185307179586, acce_lo=-10.0, acce_hi=8.0
    )

    @property
    def K(self) -> int:
        return len(self.target_speeds) * len(self.yawvels)

    @property
    def horizon(self) -> int:
        return self.stages * self.frames_per_stage


def build_ego_tree(cfg: ContingencyConfig, curr: jnp.ndarray) -> jnp.ndarray:
    """Tiled S-stage ego trajectory tree [K^S, S*F, 4] for one agent: each
    stage re-branches over the (target_speed x yawvel) lattice — the dense
    analogue of growing a Pplan TrajTree (`hardcoded.py:385-420` /
    `planning_utils.py:230-257` tiled form)."""
    K, S, F, dt = cfg.K, cfg.stages, cfg.frames_per_stage, cfg.dt
    speeds = jnp.asarray(
        [s for s in cfg.target_speeds for _ in cfg.yawvels], jnp.float32
    )
    yaws = jnp.asarray(
        [w for _ in cfg.target_speeds for w in cfg.yawvels], jnp.float32
    )

    def stage_actions(v_node):
        """One node's K candidate action segments [K, F, 2] from its start
        speed (scalar): P-controller toward each target speed + constant
        yaw-rate, like the lattice planner's profiles."""
        def speed_step(v, _):
            a = jnp.clip(cfg.speed_gain * (speeds - v), cfg.dyn.acce_lo, cfg.dyn.acce_hi)
            return jnp.clip(v + a * dt, cfg.dyn.v_lo, cfg.dyn.v_hi), a

        _, acc = jax.lax.scan(
            speed_step, jnp.full((K,), v_node), None, length=F
        )  # [F, K]
        return jnp.stack(
            [acc.T, jnp.broadcast_to(yaws[:, None], (K, F))], axis=-1
        )

    # grow stage by stage: states [n, 4] -> [n*K, 4]
    states = curr[None]  # [1, 4]
    segs = []
    for _ in range(S):
        n = states.shape[0]
        acts = jax.vmap(stage_actions)(states[:, 2])  # [n, K, F, 2]
        acts = acts.reshape(n * K, F, 2)
        x0 = jnp.repeat(states, K, axis=0)  # [n*K, 4]
        xs = unicycle_forward_dynamics(cfg.dyn, x0, acts, dt)  # [n*K, F, 4]
        segs.append(xs)
        states = xs[:, -1]
    # tile earlier stages out to the leaf count K^S
    Ne = K**S
    full = []
    for t, xs in enumerate(segs):
        reps = Ne // xs.shape[0]
        full.append(jnp.repeat(xs, reps, axis=0))
    return jnp.concatenate(full, axis=1)  # [K^S, S*F, 4]


def contingency_plan(
    cfg: ContingencyConfig,
    ego_tiled: jnp.ndarray,  # [K^S, T, 4]
    agent_modes: jnp.ndarray,  # [Ma^S, Nobs, T, 2] tiled scenario tree
    mode_prob: jnp.ndarray,  # [Ma^S] leaf probabilities (sum 1)
    agent_mask: jnp.ndarray,  # [Nobs]
    ego_extent: jnp.ndarray,  # [2]
    agent_extent: jnp.ndarray,  # [Nobs, 2]
    drivable_map: jnp.ndarray,  # [H, W]
    raster_from_agent: jnp.ndarray,  # [3, 3]
    curr_speed: Optional[jnp.ndarray] = None,  # scalar v0 (progress ref)
) -> Dict[str, jnp.ndarray]:
    """Stage-wise dynamic program over the ego x scenario trees
    (`contingency_planning`, planning_utils.py:259-385): V at the leaves is
    the stage loss; interior V adds the min over ego children of the
    scenario-expected cost-to-go Q; the returned branch is the argmin root
    child under the stage-1 mode distribution."""
    K, S, F = cfg.K, cfg.stages, cfg.frames_per_stage
    Ma = cfg.num_modes
    # progress saturation from the CURRENT speed (planning_utils.py:
    # v0 = ego_root.traj[0, 2]); ego_tiled[0, 0, 2] is already one braking
    # step in, which would bias the saturation low
    v0 = ego_tiled[0, 0, 2] if curr_speed is None else curr_speed
    d_sat = jnp.clip(v0, 2.0, None) * F * cfg.dt

    def stage_loss(t):
        """L_t [K^(t+1), Ma^(t+1)] on representative tiled rows."""
        ne, na = K ** (t + 1), Ma ** (t + 1)
        ego_rows = jnp.arange(ne) * (K ** (S - t - 1))
        agt_rows = jnp.arange(na) * (Ma ** (S - t - 1))
        seg = slice(t * F, (t + 1) * F)
        ego_seg = ego_tiled[ego_rows, seg]  # [ne, F, 4]
        agt_seg = agent_modes[agt_rows][:, :, seg]  # [na, Nobs, F, 2]
        col = jax.vmap(
            lambda a: collision_cost(
                ego_seg[..., :2], ego_extent, a[None], agent_extent, agent_mask
            )
        )(agt_seg).T  # [ne, na]
        lane = drivable_cost(ego_seg[..., :2], drivable_map, raster_from_agent)
        prog = progress_reward(ego_seg[..., :2], d_sat)
        return (
            cfg.w_collision * col
            + (cfg.w_lane * lane - cfg.w_progress * prog)[:, None]
        )

    def node_prob(t):
        """[Ma^(t+1)] subtree probability of each scenario node at stage t."""
        return mode_prob.reshape(Ma ** (t + 1), -1).sum(-1)

    # backward DP (stages indexed 0..S-1 here; reference uses 1..S)
    V = stage_loss(S - 1)  # [K^S, Ma^S]
    for t in range(S - 2, -1, -1):
        # Q[i_child (K^{t+2}), j (Ma^{t+1})] = E over j's children of V
        pc = node_prob(t + 1).reshape(Ma ** (t + 1), Ma)  # child probs
        w = pc / jnp.clip(pc.sum(-1, keepdims=True), 1e-9)
        # Q[i_child, j] = E over j's scenario children of V[i_child, child]
        Q = jnp.einsum(
            "ijm,jm->ij", V.reshape(V.shape[0], Ma ** (t + 1), Ma), w
        )
        # V_t[i, j] = L_t + min over ego children c of Q[i*K+c, j]
        V = stage_loss(t) + Q.reshape(-1, K, Ma ** (t + 1)).min(axis=1)

    # root: expected cost of each stage-0 ego branch under the stage-0 modes
    root_cost = (V * node_prob(0)[None]).sum(-1)  # [K]
    best = jnp.argmin(root_cost)

    # greedy continuation for a full-horizon plan: descend always taking the
    # min-cost child (TreeMotionPolicy.get_plan's replan-free path)
    leaf_stride = K ** (S - 1)
    leaf = best * leaf_stride  # refined below for S > 1 by local search
    if S > 1:
        # among this branch's leaves pick the lowest expected leaf-stage cost
        leaf_rows = best * leaf_stride + jnp.arange(leaf_stride)
        leaf_cost = (stage_loss(S - 1) * node_prob(S - 1)[None]).sum(-1)
        leaf = leaf_rows[jnp.argmin(leaf_cost[leaf_rows])]

    return {
        "branch": best,
        "leaf": leaf,
        "plan": ego_tiled[leaf],  # [T, 4]
        "root_cost": root_cost,
        "value": V,
    }


def _cv_modes(obs: TrafficBatch, cfg: ContingencyConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Constant-velocity neighbor predictions — the base trajectories from
    which `contingency_policy` builds its keep-CV/brake scenario tree (a
    stand-in for the learned multi-mode predictor the reference conditions
    its tree on, hardcoded.py:286-420).
    Returns (pred [B, Nobs, T, 2], mask [B, Nobs])."""
    from cld_tpu.policies.mpc import _cv_predict_neighbors

    return _cv_predict_neighbors(obs, cfg.horizon, cfg.dt)


def contingency_policy(cfg: ContingencyConfig = ContingencyConfig()):
    """Build the contingency-planner policy `(obs, rng) -> Action`
    (`ContingencyPlanner.get_action`, hardcoded.py:286-650)."""
    Ma, S, T = cfg.num_modes, cfg.stages, cfg.horizon

    if Ma > 2:
        raise ValueError(
            f"num_modes={Ma}: only 2 base scenario modes exist (keep-CV and "
            "brake); higher mode counts would silently duplicate the brake "
            "mode via clamped gathers"
        )

    def policy(obs: TrafficBatch, rng) -> Action:
        B = obs.curr_speed.shape[0]
        curr = get_current_states(obs)
        pred, mask = _cv_modes(obs, cfg)  # [B, Nobs, T, 2], [B, Nobs]
        # two base modes per stage: keep CV / brake (time reparameterized to
        # ~60% progress rate); tiled over stages -> Ma^S leaves
        slow_idx = (jnp.arange(T, dtype=jnp.float32) * 0.6).astype(jnp.int32)
        decel = pred[:, :, slow_idx]
        base = jnp.stack([pred, decel], axis=1)[:, :Ma]  # [B, Ma, Nobs, T, 2]
        Mtot = Ma**S
        leaf_mode = (
            jnp.arange(Mtot)[:, None]
            // (Ma ** (S - 1 - jnp.arange(S))[None])
        ) % Ma  # [Mtot, S]: mode index per stage

        def assemble(modes_b):
            """[Ma, Nobs, T, 2] -> tiled [Ma^S, Nobs, T, 2]."""
            segs = []
            for t in range(S):
                sel = modes_b[leaf_mode[:, t]]  # [Mtot, Nobs, T, 2]
                segs.append(sel[:, :, t * cfg.frames_per_stage:(t + 1) * cfg.frames_per_stage])
            return jnp.concatenate(segs, axis=2)

        agent_modes = jax.vmap(assemble)(base)  # [B, Mtot, Nobs, T, 2]
        prob = jnp.full((Mtot,), 1.0 / Mtot)

        def plan_one(c, am, m, ee, ae, dm, rfa):
            ego = build_ego_tree(cfg, c)
            out = contingency_plan(
                cfg, ego, am, prob, m, ee, ae, dm, rfa, curr_speed=c[2]
            )
            return out["plan"]

        agent_ext = jnp.broadcast_to(jnp.array([4.5, 2.0]), mask.shape + (2,))
        plan = jax.vmap(plan_one)(
            curr, agent_modes, mask, obs.extent[:, :2], agent_ext,
            obs.drivable_map, obs.raster_from_agent,
        )  # [B, T, 4]

        # inverse dynamics for the simulator's control interface
        v = plan[..., 2]
        acc = jnp.diff(v, axis=-1, prepend=curr[:, 2][:, None]) / cfg.dt
        from cld_tpu.ops.dynamics import angle_diff

        yawvel = angle_diff(
            plan[..., 3], jnp.concatenate([curr[:, 3][:, None], plan[..., 3][:, :-1]], axis=-1)
        ) / cfg.dt
        return Action(
            positions=plan[..., :2],
            yaws=plan[..., 3:4],
            controls=jnp.stack([acc, yawvel], axis=-1),
        )

    return policy
