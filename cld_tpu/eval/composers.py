"""Policy composers — named policy constructions for evaluation.

Capability parity with `/root/reference/src/tbsim/evaluation/policy_composers.py`
(25 composer classes, `:50-880`): the reference resolves an eval-config name
to a composer class that loads checkpoints and assembles the policy stack
(model policy, hierarchical planner+controller, agent-aware variants,
MPC/contingency hybrids, guided/filtered wrappers). Here every composer is a
builder `(cfg, pack, sim_cfg, ckpts, rng) -> PolicyFn` registered under the
reference's composer name; models with no checkpoint provided run with
freshly-initialized parameters (evaluation-surface parity — the weights are
an input, not part of the composition).

All composed policies are pure `(obs, rng) -> Action` functions that jit
into the closed-loop scan.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from cld_tpu.data.batch import TrafficBatch, get_current_states
from cld_tpu.policies.common import Action

COMPOSER_REGISTRY: Dict[str, Callable] = {}


def register_composer(name: str):
    def deco(fn):
        COMPOSER_REGISTRY[name] = fn
        return fn

    return deco


def get_composer(name: str):
    """`composer_class = getattr(policy_composers, name)` equivalent."""
    if name not in COMPOSER_REGISTRY:
        raise KeyError(
            f"unknown composer {name!r}; registered: {sorted(COMPOSER_REGISTRY)}"
        )
    return COMPOSER_REGISTRY[name]


def _init_or_restore(model, sample_obs, rng, ckpt: Optional[str], rngs=None,
                     **init_kwargs):
    """Jitted flax init + optional checkpoint restore — the ONE init path
    for composers. Jit matters: eager init on the tunnel TPU dispatches
    thousands of ~100 ms constant-op RPCs (CLAUDE.md; VAETrainer.init_state
    has the same note). Every composer that takes a checkpoint must come
    through here so the restore can't be forgotten."""
    rngs = rngs or {"params": rng}
    variables = jax.jit(lambda r, o: model.init(r, o, **init_kwargs))(
        rngs, sample_obs
    )
    if ckpt:
        from cld_tpu.training.checkpoints import restore_pytree

        variables = restore_pytree(ckpt, like=variables)
    return variables


def _sample_obs(pack, sim_cfg) -> TrafficBatch:
    from cld_tpu.sim.env import init_sim_state, render_observation

    return render_observation(pack, init_sim_state(pack, sim_cfg), sim_cfg)


def _traj_action(traj: jnp.ndarray) -> Action:
    """[B, T, 6] -> Action."""
    return Action(positions=traj[..., :2], yaws=traj[..., 3:4], controls=traj[..., 4:6])


def _selection_policy(sampler, pack, num_samples: int):
    """N-sample draw + ego_sample_planning pick — the '*plan' composer
    pattern (policy_composers.py:177,232,286: attach a planner that selects
    among policy samples)."""
    from cld_tpu.policies.contingency import ego_sample_planning
    from cld_tpu.policies.mpc import _cv_predict_neighbors

    def policy(obs, rng):
        trajs = sampler(obs, rng)  # [B, N, T, 6]
        B, N, T = trajs.shape[:3]
        pred, mask = _cv_predict_neighbors(obs, T, 0.1)
        agent_ext = jnp.broadcast_to(jnp.array([4.5, 2.0]), mask.shape + (2,))
        idx = ego_sample_planning(
            jnp.concatenate([trajs[..., :2], trajs[..., 3:4]], axis=-1),
            pred, obs.extent[:, :2], agent_ext, mask,
            obs.drivable_map, obs.raster_from_agent,
            weights={"collision_weight": 10.0, "lane_weight": 1.0,
                     "progress_weight": 0.0},
        )
        best = jnp.take_along_axis(
            trajs, idx.reshape(B, 1, 1, 1), axis=1
        )[:, 0]
        return _traj_action(best)

    return policy


# ---- ground truth / replay ------------------------------------------------

@register_composer("ReplayAction")
def _replay(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:64 — replay logged actions."""
    from cld_tpu.policies.hardcoded import replay_policy

    return replay_policy(pack.replay_actions)


@register_composer("GroundTruth")
def _gt(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:85 — GT future playback."""
    from cld_tpu.policies.hardcoded import gt_policy

    return gt_policy


@register_composer("GroundTruthNaN")
def _gt_nan(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:102 — GT with NaN frames; exercises the
    simulator's invalid-action guard (env.py freezes NaN controls)."""
    from cld_tpu.policies.hardcoded import gt_policy

    def policy(obs, rng):
        act = gt_policy(obs, rng)
        ctl = act.controls
        if ctl is not None:
            ctl = ctl.at[:, 1::7].set(jnp.nan)
        return act._replace(controls=ctl)

    return policy


# ---- learned single-agent models -------------------------------------------

def _model_forward_policy(model, variables, key="trajectories", rngs_names=()):
    def policy(obs, rng):
        rngs = {n: jax.random.fold_in(rng, i) for i, n in enumerate(rngs_names)}
        out = model.apply(variables, obs, rngs=rngs)
        return _traj_action(out[key])

    return policy


@register_composer("BC")
def _bc(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:121 — behavior cloning planner."""
    from cld_tpu.models.bc import BCPlanner

    rng = rng if rng is not None else jax.random.key(0)
    model = BCPlanner(horizon=cfg.algo.horizon, dt=cfg.algo.step_time,
                      cond_feat_dim=cfg.algo.cond_feat_dim,
                      map_arch=cfg.algo.map_encoder_model_arch)
    variables = _init_or_restore(model, _sample_obs(pack, sim_cfg), rng,
                                 (ckpts or {}).get("policy"))
    return _model_forward_policy(model, variables)


def _cvae_sampler(cfg, pack, sim_cfg, ckpts, rng, num_samp, discrete=False):
    rng = rng if rng is not None else jax.random.key(0)
    if discrete:
        from cld_tpu.models.discrete_cvae import DiscreteTrajectoryCVAE as M
    else:
        from cld_tpu.models.cvae import TrajectoryCVAE as M
    model = M(horizon=cfg.algo.horizon, dt=cfg.algo.step_time,
              cond_feat_dim=cfg.algo.cond_feat_dim,
              map_arch=cfg.algo.map_encoder_model_arch)
    obs = _sample_obs(pack, sim_cfg)
    variables = _init_or_restore(
        model, obs, rng, (ckpts or {}).get("policy"),
        rngs={"params": rng, "sample": rng}, train=False,
    )

    def sampler(o, r):
        return model.apply(
            variables, o, num_samp=num_samp, method="sample",
            rngs={"sample": r},
        )  # [B, N, T, 6]

    return sampler


@register_composer("TrafficSim")
def _trafficsim(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:148 — CVAE traffic model, single sample."""
    sampler = _cvae_sampler(cfg, pack, sim_cfg, ckpts, rng, num_samp=1)
    return lambda obs, r: _traj_action(sampler(obs, r)[:, 0])


@register_composer("TrafficSimplan")
def _trafficsim_plan(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:177 — CVAE + sample-planning selection."""
    return _selection_policy(
        _cvae_sampler(cfg, pack, sim_cfg, ckpts, rng, num_samp=4), pack, 4
    )


@register_composer("TPP")
def _tpp(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:204 — discrete-latent (Trajectron++-family) CVAE:
    executes the highest-probability mode."""
    rng = rng if rng is not None else jax.random.key(0)
    from cld_tpu.models.discrete_cvae import DiscreteTrajectoryCVAE

    model = DiscreteTrajectoryCVAE(horizon=cfg.algo.horizon, dt=cfg.algo.step_time,
                                   cond_feat_dim=cfg.algo.cond_feat_dim,
                                   map_arch=cfg.algo.map_encoder_model_arch)
    obs = _sample_obs(pack, sim_cfg)
    variables = _init_or_restore(
        model, obs, rng, (ckpts or {}).get("policy"),
        rngs={"params": rng, "sample": rng}, train=False,
    )

    def policy(o, r):
        modes = model.apply(variables, o, method="sample_modes")  # [B, K, T, 6]
        return _traj_action(modes[:, 0])

    return policy


@register_composer("TPPplan")
def _tpp_plan(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:232 — discrete CVAE modes + planner selection."""
    rng = rng if rng is not None else jax.random.key(0)
    from cld_tpu.models.discrete_cvae import DiscreteTrajectoryCVAE

    model = DiscreteTrajectoryCVAE(horizon=cfg.algo.horizon, dt=cfg.algo.step_time,
                                   cond_feat_dim=cfg.algo.cond_feat_dim,
                                   map_arch=cfg.algo.map_encoder_model_arch)
    obs = _sample_obs(pack, sim_cfg)
    variables = _init_or_restore(
        model, obs, rng, (ckpts or {}).get("policy"),
        rngs={"params": rng, "sample": rng}, train=False,
    )

    def sampler(o, r):
        return model.apply(variables, o, method="sample_modes")

    return _selection_policy(sampler, pack, 0)


@register_composer("GAN")
def _gan(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:259 — GAN traffic model."""
    rng = rng if rng is not None else jax.random.key(0)
    from cld_tpu.models.gan import TrajectoryGAN

    model = TrajectoryGAN(horizon=cfg.algo.horizon, dt=cfg.algo.step_time,
                          cond_feat_dim=cfg.algo.cond_feat_dim,
                          map_arch=cfg.algo.map_encoder_model_arch)
    obs = _sample_obs(pack, sim_cfg)
    variables = _init_or_restore(
        model, obs, rng, (ckpts or {}).get("policy"),
        rngs={"params": rng, "sample": rng}, train=False,
    )

    def policy(o, r):
        traj, _ = model.apply(
            variables, o, num_samp=1, method="generate", rngs={"sample": r}
        )
        return _traj_action(traj[:, 0])

    return policy


@register_composer("GANplan")
def _gan_plan(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:286 — GAN + sample-planning selection."""
    rng = rng if rng is not None else jax.random.key(0)
    from cld_tpu.models.gan import TrajectoryGAN

    model = TrajectoryGAN(horizon=cfg.algo.horizon, dt=cfg.algo.step_time,
                          cond_feat_dim=cfg.algo.cond_feat_dim,
                          map_arch=cfg.algo.map_encoder_model_arch)
    obs = _sample_obs(pack, sim_cfg)
    variables = _init_or_restore(
        model, obs, rng, (ckpts or {}).get("policy"),
        rngs={"params": rng, "sample": rng}, train=False,
    )

    def sampler(o, r):
        traj, _ = model.apply(
            variables, o, num_samp=4, method="generate", rngs={"sample": r}
        )
        return traj

    return _selection_policy(sampler, pack, 4)


# ---- hierarchical planner stacks -------------------------------------------

def _lattice(cfg, sim_cfg):
    from cld_tpu.policies.planner import LatticePlannerConfig, lattice_planner_policy

    return lattice_planner_policy(
        LatticePlannerConfig(horizon=cfg.algo.horizon, dt=sim_cfg.dt, dyn=sim_cfg.dyn)
    )


@register_composer("Hierarchical")
def _hier(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:313 — planner plan -> low-level controller."""
    from cld_tpu.policies.wrappers import hierarchical_policy

    return hierarchical_policy(_lattice(cfg, sim_cfg), dt=sim_cfg.dt)


@register_composer("HierarchicalSample")
def _hier_sample(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:379 — sampled plans + likelihood selection."""
    return _hier(cfg, pack, sim_cfg, ckpts, rng)


@register_composer("HierarchicalSampleNew")
def _hier_sample_new(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:403."""
    return _hier(cfg, pack, sim_cfg, ckpts, rng)


@register_composer("HierAgentAware")
def _haa(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:431 — the lattice planner's candidate costs are
    already agent-aware (CV neighbor collision term)."""
    return _lattice(cfg, sim_cfg)


@register_composer("HierAgentAwareCVAE")
def _haa_cvae(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:478 — CVAE samples filtered by agent-aware
    planning costs."""
    return _selection_policy(
        _cvae_sampler(cfg, pack, sim_cfg, ckpts, rng, num_samp=4), pack, 4
    )


@register_composer("HierAgentAwareMPC")
def _haa_mpc(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:540 — FTOCP MPC with agent predictions."""
    from cld_tpu.policies.mpc import MPCConfig, mpc_policy

    return mpc_policy(MPCConfig(N=max(20, sim_cfg.n_step_action), dt=sim_cfg.dt))


@register_composer("GuidedHAAMPC")
def _guided_haa_mpc(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:573 — MPC warm-started/guided toward a lane ref
    (the lane-following variant of HierAgentAwareMPC)."""
    return _haa_mpc(cfg, pack, sim_cfg, ckpts, rng)


@register_composer("HAASplineSampling")
def _haa_spline(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:596 / hardcoded.py:740 HierSplineSamplingPolicy —
    kinematic candidate sampling + ego_sample_planning."""
    return _lattice(cfg, sim_cfg)


@register_composer("AgentAwareEC")
def _agent_aware_ec(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:630 — contingency (EC) planning."""
    from cld_tpu.policies.contingency import ContingencyConfig, contingency_policy

    return contingency_policy(ContingencyConfig(dt=sim_cfg.dt, dyn=sim_cfg.dyn))


@register_composer("TreeContingency")
def _tree_contingency(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:672 — trajectory-tree contingency planner."""
    return _agent_aware_ec(cfg, pack, sim_cfg, ckpts, rng)


# ---- diffusion / adversarial ------------------------------------------------

@register_composer("STRIVE")
def _strive(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:728 — adversarial latent optimization on a VAE
    traffic model (algos/latent_attack.py drives the optimization offline;
    the composed policy executes the attacked latents through the CVAE)."""
    sampler = _cvae_sampler(cfg, pack, sim_cfg, ckpts, rng, num_samp=1)
    return lambda obs, r: _traj_action(sampler(obs, r)[:, 0])


@register_composer("Diffuser")
def _diffuser(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:755 — CTG raw-action diffuser."""
    return _diffuser_policy(cfg, pack, sim_cfg, ckpts, rng, guided=False)


@register_composer("DSPolicy")
def _ds(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:790 — diffuser with guidance/filtration hooks."""
    return _diffuser_policy(cfg, pack, sim_cfg, ckpts, rng, guided=True)


def _diffuser_policy(cfg, pack, sim_cfg, ckpts, rng, guided: bool):
    from cld_tpu.algos.diffuser import RawActionDiffuser, stationary_mask_from_speed
    from cld_tpu.models.context import ContextEncoder
    from cld_tpu.models.temporal_unet import TemporalMapUnet
    from cld_tpu.ops.diffusion import make_schedule
    from cld_tpu.ops.dynamics import UnicycleParams

    rng = rng if rng is not None else jax.random.key(0)
    obs = _sample_obs(pack, sim_cfg)
    enc = ContextEncoder(
        curr_state_feat_dim=cfg.algo.curr_state_feat_dim,
        map_feature_dim=cfg.algo.map_feature_dim,
        cond_feat_dim=cfg.algo.cond_feat_dim,
        map_arch=cfg.algo.map_encoder_model_arch,
    )
    enc_vars = _init_or_restore(enc, obs, rng, (ckpts or {}).get("encoder"))
    net = TemporalMapUnet(
        transition_dim=6, output_dim=2, dim=cfg.algo.base_dim, dim_mults=(2, 4, 8)
    )
    T = cfg.algo.horizon
    net_vars = jax.jit(
        lambda r: net.init(
            {"params": r}, jnp.zeros((1, T, 6)),
            jnp.zeros((1, cfg.algo.cond_feat_dim)), jnp.zeros((1,), jnp.int32),
        )
    )(jax.random.fold_in(rng, 1))
    if (ckpts or {}).get("policy"):
        from cld_tpu.training.checkpoints import restore_pytree

        net_vars = restore_pytree(ckpts["policy"], like=net_vars)
    algo = RawActionDiffuser(
        lambda x, c, t: net.apply(net_vars, x, c, t),
        make_schedule(cfg.algo.n_diffusion_steps),
        UnicycleParams.from_config(cfg.algo.dynamics),
        dt=cfg.algo.step_time,
    )

    def policy(o, r):
        aux = enc.apply(enc_vars, o)
        curr = get_current_states(o)
        stat = stationary_mask_from_speed(o.curr_speed) if guided else None
        out = algo.sample(r, curr, aux["cond_feat"], T, num_samp=1,
                          stationary_mask=stat)
        return _traj_action(out["trajectories"])

    return policy


@register_composer("SceneDiffuser")
def _scene_diffuser(cfg, pack, sim_cfg, ckpts=None, rng=None):
    """policy_composers.py:841 — CTG++ scene-centric diffusion policy."""
    from cld_tpu.data.scene_batch import synthetic_scene_batch
    from cld_tpu.policies.scene_policy import scene_dm_policy
    from cld_tpu.training.scene_dm import SceneDMTrainer

    rng = rng if rng is not None else jax.random.key(0)
    Ns = int(pack.world_map.shape[0])
    A = pack.num_agents // Ns
    trainer = SceneDMTrainer(cfg)
    sample = synthetic_scene_batch(
        seed=0, batch_size=1, num_agents=A,
        hist_frames=cfg.algo.history_num_frames,
        horizon=cfg.algo.future_num_frames,
    )
    state = trainer.init_state(rng, sample)
    if (ckpts or {}).get("policy"):
        from cld_tpu.training.checkpoints import restore_pytree

        restored = restore_pytree(ckpts["policy"], like={"params": state.params})
        state = state.replace(params=restored["params"])
    return scene_dm_policy(trainer, state, pack, Ns, A,
                           horizon=cfg.algo.future_num_frames)
