#!/usr/bin/env python
"""Closed-loop guided simulation CLI.

Capability parity with `/root/reference/rollout.py:21-118` +
`guided_rollout` (`scene_edit_utils.py:15-160`): load VAE/DM checkpoints,
build scenes, run receding-horizon rollout with optional test-time guidance,
report closed-loop metrics, and dump world-frame trajectories.

The whole rollout is one jitted scan (cld_tpu.sim.env.simulate): the policy
below renders nothing on the host — observation -> context encoding ->
100-step guided sampling -> VAE decode -> unicycle actions all happen inside
the scan body.

Usage:
    python rollout.py --vae-ckpt runs/vae/ckpt_final --dm-ckpt runs/dm/ckpt_final \
        --num-scenes 2 --agents-per-scene 4 --guidance speed_limit:15
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

# honor JAX_PLATFORMS explicitly: the axon TPU plugin overrides the env var
# (CLAUDE.md), so `JAX_PLATFORMS=cpu python rollout.py ...` would silently
# land on (or hang waiting for) the TPU without this
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from cld_tpu.algos.dm import sample_traj
from cld_tpu.data.batch import get_current_states
from cld_tpu.guidance.losses import GuidanceContext, prepack_drivable
from cld_tpu.guidance.parsing import parse_guidance_arg, specs_from_configs
from cld_tpu.guidance.perturbation import (
    choose_best_sample,
    choose_closest_to_gt,
    make_perturbation_guidance,
    per_sample_guidance_loss,
)
from cld_tpu.models.vae import convert_action_to_state_and_action, decode_actions
from cld_tpu.ops.dynamics import UnicycleParams
from cld_tpu.ops.geometry import world_from_agent_matrix
from cld_tpu.ops.normalization import TrajNormalizer
from cld_tpu.sim.env import SimConfig, simulate
from cld_tpu.sim.metrics import summarize_metrics
from cld_tpu.sim.scene import synthetic_scene_pack
from cld_tpu.utils.config import default_config, load_config


def build_guidance_specs(args, pack, sim_cfg, num_agents):
    """Guidance rules from the editing sources (`reference rollout.py:288-290,
    369-375` editing_source config|heuristic|ui|none):

    * config     — --guidance configs (shorthand, inline JSON, or @file)
    * heuristic  — --heuristics: either a name list ("stop_sign,social_group")
                   or @file of REFERENCE-format {name, weight, params} dicts
    * ui         — --ui-edits-file: a guidance-config JSON produced by an
                   interactive editor, re-read fresh on every rollout
                   invocation (the reference's UI is a host-side config
                   producer; file-watch is the headless equivalent)
    * none       — only explicit --guidance rules
    """
    known_sources = {"config", "heuristic", "ui", "none"}
    sources = [s for s in args.editing_source.split(",") if s]
    unknown = set(sources) - known_sources
    if unknown:
        raise SystemExit(
            f"unknown --editing-source {sorted(unknown)}; "
            f"expected a comma list of {sorted(known_sources)}"
        )
    sources = [s for s in sources if s != "none"]
    specs = list(specs_from_configs(parse_guidance_arg(args.guidance), num_agents))
    if "heuristic" in sources:
        from cld_tpu.guidance.heuristics import (
            compute_heuristic_guidance,
            heuristic_collision_attack,
            heuristics_from_configs,
        )
        from cld_tpu.sim.env import init_sim_state

        state0 = init_sim_state(pack, sim_cfg)
        if args.heuristics.startswith("@"):
            import json as _json

            with open(args.heuristics[1:]) as f:
                specs.extend(
                    heuristics_from_configs(_json.load(f), pack, state0,
                                            dt=sim_cfg.dt)
                )
        else:
            names = [n for n in args.heuristics.split(",") if n]
            specs.extend(
                compute_heuristic_guidance(names, pack, state0, dt=sim_cfg.dt)
            )
        if args.attack_pair:
            a, v = (int(s) for s in args.attack_pair.split(","))
            specs.append(heuristic_collision_attack(a, v))
    if "ui" in sources:
        if not args.ui_edits_file:
            raise SystemExit("--editing-source ui requires --ui-edits-file")
        specs.extend(
            specs_from_configs(
                parse_guidance_arg("@" + args.ui_edits_file), num_agents
            )
        )
    return specs


def raster_from_world_per_agent(pack):
    """[Na, 3, 3] world->pixel transforms built from each agent's OWN scene
    origin — origins differ across scenes in real-scene packs
    (sim/scene.py:scene_pack_from_shards), so a shared scene-0 matrix would
    misplace every other scene's queries."""
    org = pack.map_origin[pack.scene_index]  # [Na, 2]
    res = float(pack.map_resolution)
    Na = org.shape[0]
    zeros = jnp.zeros((Na,))
    ones = jnp.ones((Na,))
    return jnp.stack([
        jnp.stack([ones / res, zeros, -org[:, 0] / res], axis=-1),
        jnp.stack([zeros, ones / res, -org[:, 1] / res], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=1)


def occupancy_report(pack, traj):
    """Occupancy-grid metrics over the executed rollout
    (`env_metrics.py:977+`), one grid PER SCENE: each scene's positions are
    splatted against its own map + origin, then the reductions average
    across scenes."""
    from cld_tpu.sim.occupancy import occupancy_init, occupancy_metrics, occupancy_update

    Hw = pack.world_map.shape[1]
    scene_idx_np = np.asarray(pack.scene_index)
    traj_np = np.asarray(traj)
    occ_per_scene = []
    for s in range(pack.world_map.shape[0]):
        in_scene = scene_idx_np == s
        if not in_scene.any():
            continue
        occ = occupancy_init(
            origin=(float(pack.map_origin[s, 0]), float(pack.map_origin[s, 1])),
            size=(Hw // 2, Hw // 2), step=2 * pack.map_resolution, sigma=1.0,
        )
        occ = occupancy_update(occ, traj_np[:, in_scene, :2].reshape(-1, 2))
        occ_per_scene.append(
            occupancy_metrics(occ, pack.world_map[s, :, :, 0],
                              pack.map_origin[s], pack.map_resolution)
        )
    return {
        k: float(np.mean([d[k] for d in occ_per_scene])) for k in occ_per_scene[0]
    }


def guidance_satisfaction_report(pack, traj, sim_cfg, specs):
    """Per-rule satisfaction on the executed world-frame trajectories
    (guidance_metrics.py:896-930 mirror metrics)."""
    from cld_tpu.guidance.metrics import executed_traj_from_states, guidance_metrics

    executed = executed_traj_from_states(traj, dt=sim_cfg.dt)
    Na = pack.num_agents
    exec_ctx = GuidanceContext(
        drivable_map=pack.world_map[pack.scene_index, :, :, 0],
        raster_from_agent=raster_from_world_per_agent(pack),
        extent=pack.extent,
        curr_speed=pack.init_states[:, 2],
        world_from_agent=world_from_agent_matrix(
            jnp.zeros((Na, 2)), jnp.zeros((Na,))
        ),
        scene_index=pack.scene_index,
        # executed trajectories are world-frame, so world lane points
        # are already in the "agent" frame of this context
        lane_points=(pack.lane_points[pack.scene_index]
                     if pack.lane_points is not None else None),
        lane_avail=(pack.lane_avail[pack.scene_index]
                    if pack.lane_avail is not None else None),
    )
    gm = guidance_metrics(specs, executed, exec_ctx)
    return {k: float(np.nanmean(v)) for k, v in gm.items()}


def make_dm_policy(cfg, args, pack, sim_cfg, specs):
    """Build the jittable policy: obs -> (guided) latent sampling -> actions."""
    from train import _build_dm
    from cld_tpu.data.synthetic import synthetic_batch

    sample_batch = synthetic_batch(
        seed=0, batch_size=2, raster_size=sim_cfg.raster_size,
        hist_frames=sim_cfg.hist_frames,
    )
    dm_trainer, dm_state = _build_dm(cfg, args, sample_batch)
    dyn = UnicycleParams.from_config(cfg.algo.dynamics)
    normalizer = TrajNormalizer()
    num_samp = args.num_action_samples

    def policy(obs, rng):
        Na = obs.curr_speed.shape[0]
        enc_rng, samp_rng = jax.random.split(rng)
        _, aux = dm_trainer.encode(obs, enc_rng)
        curr_states = get_current_states(obs)
        cond_rep = jnp.repeat(aux["cond_feat"], num_samp, axis=0)
        curr_rep = jnp.repeat(curr_states, num_samp, axis=0)

        def decode_fn(z):
            acts = decode_actions(
                dm_trainer.vae, dm_trainer.vae_variables, z, cond_rep,
                impl=args.decode_impl,
            )
            traj = convert_action_to_state_and_action(
                acts, curr_rep, dyn, normalizer, descaled_output=True
            )
            return traj.reshape(Na, num_samp, *traj.shape[1:])

        guidance_fn = None
        ctx = None
        if specs:
            w_from_a = obs.world_from_agent
            if w_from_a is None:
                w_from_a = world_from_agent_matrix(jnp.zeros((Na, 2)), jnp.zeros((Na,)))
            # world-frame ego history for the global rules' stop latch
            hist_world = None
            if obs.history_speeds is not None:
                from cld_tpu.ops.geometry import transform_points as _tp

                hp_w = _tp(obs.history_positions, w_from_a)
                dyaw = jnp.arctan2(w_from_a[:, 1, 0], w_from_a[:, 0, 0])
                hist_world = jnp.concatenate(
                    [hp_w, obs.history_speeds[..., None],
                     obs.history_yaws + dyaw[:, None, None]], axis=-1,
                )
            # per-replan closest-lane context (the closed-loop analogue of
            # the reference's extras["closest_lane_point"]) — queried once
            # by render_observation (sim/env.py) and shared by the guidance
            # rules and the MPC's lane-tracking reference
            lane_pts, lane_av = obs.lane_points, obs.lane_avail
            ctx = prepack_drivable(GuidanceContext(
                drivable_map=obs.drivable_map,
                raster_from_agent=obs.raster_from_agent,
                extent=obs.extent,
                curr_speed=obs.curr_speed,
                world_from_agent=w_from_a,
                scene_index=obs.scene_index if obs.scene_index is not None else pack.scene_index,
                lane_points=lane_pts,
                lane_avail=lane_av,
                agent_from_world=obs.agent_from_world,
                global_t=obs.sim_step,
                agent_hist_world=hist_world,
            ))
            if not args.guide_as_filter_only:
                guidance_fn = make_perturbation_guidance(
                    ctx, specs, decode_fn,
                    lr=args.guidance_lr, grad_steps=args.guidance_steps,
                    perturb_th=args.perturb_th,
                    sigma_schedule=jnp.exp(
                        0.5 * dm_trainer.schedule.posterior_log_variance_clipped
                    ),
                    n_timesteps=dm_trainer.schedule.n_timesteps,
                )

        if args.sampler == "ddim":
            from cld_tpu.algos.dm import sample_traj_ddim

            out = sample_traj_ddim(
                dm_trainer.denoise_fn(dm_state.params),
                dm_trainer.schedule,
                samp_rng,
                aux["cond_feat"],
                cfg.algo.horizon,
                cfg.algo.vae.latent_size,
                num_samp=num_samp,
                num_steps=args.ddim_steps,
                eta=args.ddim_eta,
                guidance_fn=guidance_fn,
            )
        else:
            out = sample_traj(
                dm_trainer.denoise_fn(dm_state.params),
                dm_trainer.schedule,
                samp_rng,
                aux["cond_feat"],
                cfg.algo.horizon,
                cfg.algo.vae.latent_size,
                num_samp=num_samp,
                guidance_fn=guidance_fn,
                guidance_stride=args.guidance_stride,
                guidance_clean=args.guide_clean,
                guidance_output=args.guide_output,
            )
        traj = decode_fn(out["pred_traj"])  # [Na, N, T, 6] descaled
        if num_samp > 1 and args.guide_with_gt and obs.target_positions is not None:
            # guide_with_gt takes precedence over guidance-loss filtration
            # (`algos/algos.py:2058`, choose_action_from_gt)
            best, _ = choose_closest_to_gt(
                traj, traj[..., :2], obs.target_positions,
                obs.target_availabilities,
            )
        elif num_samp > 1 and specs:
            # filtration: pick the sample minimizing the total guidance
            # loss (`choose_action_from_guidance`, guidance_loss.py:22;
            # algos/algos.py:2024-2100) — scene-coupled rules force ONE
            # shared sample per scene (guidance_loss.py:49-56)
            from cld_tpu.guidance.perturbation import is_scene_level_spec

            losses = per_sample_guidance_loss(traj, ctx, specs)  # [Na, N]
            best, _ = choose_best_sample(
                traj, losses, scene_index=obs.scene_index,
                scene_level=any(is_scene_level_spec(s) for s in specs),
            )  # [Na, T, 6]
        else:
            best = traj[:, 0]
        actions = best[:, :, 4:6]
        return actions

    return policy


def main():
    parser = argparse.ArgumentParser(description="cld_tpu closed-loop rollout")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--registered-name", type=str, default=None,
                        help="named experiment config (cld_tpu.utils.registry)"
                             " — must match the config the checkpoints were "
                             "trained with")
    parser.add_argument("--vae-ckpt", type=str, default=None)
    parser.add_argument("--dm-ckpt", type=str, default=None)
    parser.add_argument("--scene-data", type=str, default=None,
                        help="packed-shard directory of converted scenes "
                             "(cld_tpu.data.convert); builds the sim world "
                             "from real data instead of the synthetic road "
                             "(env_trajdata.py:154-231 reset-from-dataset)")
    parser.add_argument("--scene-start-index", type=int, default=0)
    parser.add_argument("--num-scenes", type=int, default=1)
    parser.add_argument("--agents-per-scene", type=int, default=4)
    parser.add_argument("--num-sim-steps", type=int, default=100)
    parser.add_argument("--n-step-action", type=int, default=5)
    parser.add_argument("--raster-size", type=int, default=None)
    parser.add_argument("--num-action-samples", type=int, default=1)
    parser.add_argument("--policy", type=str, default="dm",
                        choices=["dm", "lattice", "gt_replay", "mpc", "contingency"],
                        help="dm: guided diffusion; lattice: kinematic "
                             "planner; gt_replay: replay-actions baseline; "
                             "mpc: FTOCP penalty solver (ftocp.py:6); "
                             "contingency: tree contingency planner "
                             "(planning_utils.py:259)")
    parser.add_argument("--composer", type=str, default=None,
                        help="named policy composer (cld_tpu.eval.composers, "
                             "the policy_composers.py registry); overrides "
                             "--policy. Checkpoint via --composer-ckpt")
    parser.add_argument("--composer-ckpt", type=str, default=None)
    parser.add_argument("--agents-policy", type=str, default=None,
                        choices=[None, "dm", "lattice", "gt_replay", "mpc", "contingency"],
                        help="separate policy for non-ego agents (the "
                             "EnvSplitUnifiedSimulation pattern, "
                             "env_trajdata.py:520): ego = first agent of "
                             "each scene")
    parser.add_argument("--sampler", type=str, default="ddpm", choices=["ddpm", "ddim"])
    parser.add_argument("--decode-impl", type=str, default="auto",
                        choices=["auto", "flax", "pallas", "ref", "interpret"],
                        help="guidance decode indirection: fused pallas LSTM "
                             "stack (auto: on TPU) or the flax module scan")
    parser.add_argument("--ddim-steps", type=int, default=50)
    parser.add_argument("--ddim-eta", type=float, default=0.0)
    parser.add_argument("--guidance", type=str, default="",
                        help="e.g. 'speed_limit:15,agent_collision'")
    parser.add_argument("--editing-source", type=str, default="config",
                        help="comma list of config|heuristic|ui|none "
                             "(reference rollout.py:288-290). heuristic: "
                             "auto-build guidance from scene state "
                             "(scene_edit_utils.py:809); ui: read guidance "
                             "configs from --ui-edits-file (fresh each run)")
    parser.add_argument("--heuristics", type=str,
                        default="target_speed,agent_collision,map_collision",
                        help="comma list for --editing-source heuristic, or "
                             "@file.json of reference-format "
                             "{name, weight, params} heuristic configs")
    parser.add_argument("--ui-edits-file", type=str, default=None,
                        help="guidance-config JSON for --editing-source ui; "
                             "re-read on every invocation (forces one scene, "
                             "reference rollout.py:373-375)")
    parser.add_argument("--attack-pair", type=str, default=None,
                        help="'attacker,victim' agent indices for an "
                             "adversarial collision-attack rule")
    parser.add_argument("--guide-as-filter-only", action="store_true",
                        help="skip per-step perturbation; use guidance only "
                             "to select among --num-action-samples plans "
                             "(dm_composer.py:6-34 guide_as_filter_only)")
    parser.add_argument("--guide-with-gt", action="store_true",
                        help="with --num-action-samples > 1: select the "
                             "sample closest to the observation's GT future "
                             "instead of the lowest guidance loss "
                             "(choose_action_from_gt, guidance_loss.py:67)")
    parser.add_argument("--guide-clean", action="store_true",
                        help="perturb the clean x0 reconstruction instead of "
                             "the noisy posterior mean (diffuser.py:863-918 "
                             "guide_clean)")
    parser.add_argument("--guidance-lr", type=float, default=0.3)
    parser.add_argument("--guidance-steps", type=int, default=1)
    parser.add_argument("--guidance-stride", type=int, default=1,
                        help="apply guidance every k-th denoise step")
    parser.add_argument("--perturb-th", type=float, default=None,
                        help="clip bound on the cumulative perturbation "
                             "delta. Default None = clip to the posterior "
                             "sigma at step t (the reference config of "
                             "record, scene_edit_config.py:79); an explicit "
                             "value decays sigmoidally from ~4 to the given "
                             "bound over the denoise steps "
                             "(diffuser.py:890-893)")
    parser.add_argument("--guide-output", action="store_true",
                        help="also perturb the final t=0 output step "
                             "(apply_guidance_output; the reference config "
                             "of record leaves it off, "
                             "scene_edit_config.py:85)")
    parser.add_argument("--cle-report", action="store_true",
                        help="append a closed-loop-evaluator validation "
                             "summary (range validators + driven-miles "
                             "composites, cld_tpu.eval.cle) to the metrics")
    parser.add_argument("--ebm-ckpt", type=str, default=None,
                        help="trained PermuteEBM checkpoint (train.py --mode "
                             "ebm); adds the learned closed-loop realism "
                             "metric (env_metrics.py:649-959) to the report")
    parser.add_argument("--output", type=str, default="rollout_out")
    parser.add_argument("--render", action="store_true",
                        help="save scene PNG + GIF renders")
    parser.add_argument("--save-every-n-frames", type=int, default=5,
                        help="GIF frame stride (reference rollout.py "
                             "--save_every_n_frames)")
    parser.add_argument("--render-size", type=float, default=8.0,
                        help="render figure size in inches (reference "
                             "--render_size analogue)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    if "ui" in args.editing_source.split(","):
        # UI edits target a single scene (reference rollout.py:373-375)
        args.num_scenes = 1

    if args.registered_name:
        from cld_tpu.utils.registry import get_registered_experiment_config

        cfg = get_registered_experiment_config(args.registered_name)
        if args.config:
            cfg = load_config(args.config, base=cfg.unlock())
    else:
        cfg = load_config(args.config) if args.config else default_config().lock()
    raster = args.raster_size or cfg.env.rasterizer.raster_size
    sim_cfg = SimConfig(
        num_simulation_steps=args.num_sim_steps,
        n_step_action=args.n_step_action,
        hist_frames=cfg.algo.history_num_frames,
        raster_size=raster,
        pixel_size=cfg.env.rasterizer.pixel_size,
        dyn=UnicycleParams.from_config(cfg.algo.dynamics),
    )
    if args.scene_data:
        from cld_tpu.sim.scene import scene_pack_from_shards

        pack = scene_pack_from_shards(
            args.scene_data,
            num_scenes=args.num_scenes,
            agents_per_scene=args.agents_per_scene,
            sim_steps=args.num_sim_steps,
            start_index=args.scene_start_index,
        )
    else:
        pack = synthetic_scene_pack(
            seed=args.seed,
            num_scenes=args.num_scenes,
            agents_per_scene=args.agents_per_scene,
            sim_steps=args.num_sim_steps,
        )
    specs = build_guidance_specs(args, pack, sim_cfg, pack.num_agents)

    def build_policy(name):
        if args.composer:
            from cld_tpu.eval.composers import get_composer

            return get_composer(args.composer)(
                cfg, pack, sim_cfg,
                ckpts={"policy": args.composer_ckpt},
                rng=jax.random.key(args.seed),
            )
        if name == "lattice":
            from cld_tpu.policies.planner import (
                LatticePlannerConfig,
                lattice_planner_policy,
            )

            return lattice_planner_policy(
                LatticePlannerConfig(horizon=cfg.algo.horizon, dt=sim_cfg.dt,
                                     dyn=sim_cfg.dyn)
            )
        if name == "gt_replay":
            from cld_tpu.policies.hardcoded import replay_policy

            return replay_policy(pack.replay_actions)
        if name == "mpc":
            from cld_tpu.policies.mpc import MPCConfig, mpc_policy

            return mpc_policy(MPCConfig(N=max(20, args.n_step_action), dt=sim_cfg.dt))
        if name == "contingency":
            from cld_tpu.policies.contingency import (
                ContingencyConfig,
                contingency_policy,
            )

            return contingency_policy(
                ContingencyConfig(dt=sim_cfg.dt, dyn=sim_cfg.dyn)
            )
        return make_dm_policy(cfg, args, pack, sim_cfg, specs)

    policy = build_policy(args.policy)
    if args.agents_policy and args.agents_policy != args.policy:
        from cld_tpu.policies.wrappers import masked_policy

        # ego = first agent of each scene (the split-sim convention)
        ego_mask = np.zeros(pack.num_agents, bool)
        ego_mask[:: args.agents_per_scene] = True
        policy = masked_policy(
            jnp.asarray(ego_mask), policy, build_policy(args.agents_policy)
        )

    print(
        f"rollout: {pack.num_agents} agents, {sim_cfg.num_replans} replans x "
        f"{sim_cfg.n_step_action} steps, "
        f"rules={[type(s.loss).__name__ for s in specs] or 'none'}",
        flush=True,
    )
    run = jax.jit(lambda rng: simulate(pack, policy, rng, sim_cfg))
    t0 = time.perf_counter()
    state, traj = run(jax.random.key(args.seed))
    traj.block_until_ready()
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, traj = run(jax.random.key(args.seed + 1))
    traj.block_until_ready()
    steady = time.perf_counter() - t0

    metrics = summarize_metrics(pack, state, sim_cfg)

    # occupancy-grid metrics over the executed rollout (env_metrics.py:977+)
    metrics.update(occupancy_report(pack, traj))

    if args.cle_report:
        # l5kit-CLE-style validation: range validators with violation-
        # duration semantics + driven-miles composites over the rollout log
        from cld_tpu.eval.cle import cle_report

        metrics["cle"] = cle_report(pack, traj, sim_cfg)

    if args.ebm_ckpt:
        # learned realism metric over the executed rollout
        from cld_tpu.sim.learned_metrics import ebm_rollout_metric
        from cld_tpu.training.checkpoints import restore_pytree
        from cld_tpu.training.ebm import EBMTrainer

        from cld_tpu.sim.env import init_sim_state, render_observation

        ebm_trainer = EBMTrainer(cfg)
        sample_obs = render_observation(pack, init_sim_state(pack, sim_cfg), sim_cfg)
        state0 = ebm_trainer.init_state(jax.random.key(0), sample_obs)
        like = {"params": state0.params, "batch_stats": state0.batch_stats}
        restored = restore_pytree(args.ebm_ckpt, like=like)
        state0 = state0.replace(params=restored["params"])
        if restored.get("batch_stats") is not None:
            state0 = state0.replace(batch_stats=restored["batch_stats"])
        em = jax.jit(
            lambda tr: ebm_rollout_metric(
                pack, tr, ebm_trainer.score_fn(state0), sim_cfg,
                horizon=cfg.algo.horizon,
            )
        )(traj)
        metrics["ebm_score_mean"] = float(em["ebm_score_mean"])
        metrics["ebm_score_min"] = float(em["ebm_score_min"])

    agent_steps_per_sec = pack.num_agents * sim_cfg.num_simulation_steps / steady
    metrics["wall_clock_s"] = steady
    metrics["agent_steps_per_sec"] = agent_steps_per_sec
    metrics["compile_and_first_run_s"] = compile_and_run

    if specs:
        metrics["guidance_satisfaction"] = guidance_satisfaction_report(
            pack, traj, sim_cfg, specs
        )
    print(json.dumps(metrics, indent=2))

    os.makedirs(args.output, exist_ok=True)
    np.savez(
        os.path.join(args.output, "trajectories.npz"),
        trajectories=np.asarray(traj),
        controlled_mask=np.asarray(pack.controlled_mask),
        scene_index=np.asarray(pack.scene_index),
    )
    print(f"saved trajectories -> {args.output}/trajectories.npz")

    if args.render:
        from cld_tpu.viz.render import render_scene_rollout, save_rollout_gif

        for s in range(args.num_scenes):
            render_scene_rollout(
                pack, np.asarray(traj), scene=s,
                out_path=os.path.join(args.output, f"scene_{s:03d}.png"),
                figsize=args.render_size,
            )
            save_rollout_gif(
                pack, np.asarray(traj),
                os.path.join(args.output, f"scene_{s:03d}.gif"), scene=s,
                stride=args.save_every_n_frames, figsize=args.render_size,
            )
        print(f"saved renders -> {args.output}/scene_*.png/gif")


if __name__ == "__main__":
    main()
