"""Scene-centric closed-loop policy adapter.

Completes the CTG++ path end-to-end: the simulator's flattened agent
observations are regrouped into SceneBatch tensors (scenes x agents), the
scene diffusion model jointly samples ALL agents' trajectories per scene,
and the actions scatter back to the flat agent axis — the scene-centric
equivalent of the reference's scene-level rollout
(`/root/reference/src/tbsim/algos/algos.py:2307` SceneDiffuserTrafficModel
driving `EnvUnifiedSimulation`). Requires equal agents-per-scene (our
ScenePack layout), so regrouping is a static reshape inside the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cld_tpu.data.scene_batch import SceneBatch
from cld_tpu.policies.common import Action


def scene_batch_from_obs(
    obs, pack, num_scenes: int, agents_per_scene: int, horizon: int = 52
) -> SceneBatch:
    """Flattened TrafficBatch (Na agents) -> SceneBatch [Ns, A, ...].

    Per-agent histories are already in each agent's local frame (the
    simulator's renderer standardizes them); scene poses come from the
    world transforms the renderer attaches.
    """
    Ns, A = num_scenes, agents_per_scene

    def group(x):
        return x.reshape(Ns, A, *x.shape[1:])

    hist_speed = jnp.linalg.norm(
        jnp.diff(obs.history_positions, axis=-2, prepend=obs.history_positions[..., :1, :]),
        axis=-1,
    ) / 0.1
    hist_speed = hist_speed.at[..., -1].set(obs.curr_speed)

    pos_scene = obs.world_from_agent[:, :2, 2]
    yaw_scene = jnp.arctan2(obs.world_from_agent[:, 1, 0], obs.world_from_agent[:, 0, 0])

    T = horizon  # the scene model's trained plan horizon
    return SceneBatch(
        hist_positions=group(obs.history_positions),
        hist_yaws=group(obs.history_yaws),
        hist_speeds=group(hist_speed),
        hist_avail=group(obs.history_availabilities),
        fut_positions=group(jnp.zeros((Ns * A, T, 2))),
        fut_yaws=group(jnp.zeros((Ns * A, T, 1))),
        fut_avail=group(jnp.ones((Ns * A, T))),
        curr_speed=group(obs.curr_speed),
        extent=group(obs.extent),
        agent_pos_scene=group(pos_scene),
        agent_yaw_scene=group(yaw_scene),
        agent_mask=jnp.ones((Ns, A), dtype=bool),
    )


def scene_dm_policy(trainer, state, pack, num_scenes: int, agents_per_scene: int,
                    horizon: int = 52):
    """(obs, rng) -> Action using joint scene sampling."""

    def policy(obs, rng):
        sb = scene_batch_from_obs(obs, pack, num_scenes, agents_per_scene, horizon)
        traj = trainer.sample(state, sb, rng)  # [Ns, A, T, 6] descaled, local frames
        flat = traj.reshape(num_scenes * agents_per_scene, *traj.shape[2:])
        return Action(
            positions=flat[..., :2], yaws=flat[..., 3:4], controls=flat[..., 4:6]
        )

    return policy
