"""Policy composer registry: every reference composer name resolves and
produces a runnable policy (VERDICT missing #9; ref policy_composers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cld_tpu.eval.composers import COMPOSER_REGISTRY, get_composer
from cld_tpu.sim.env import SimConfig, init_sim_state, render_observation
from cld_tpu.sim.scene import synthetic_scene_pack
from cld_tpu.utils.registry import get_registered_experiment_config

REFERENCE_COMPOSERS = [
    "ReplayAction", "GroundTruth", "GroundTruthNaN", "BC", "TrafficSim",
    "TrafficSimplan", "TPP", "TPPplan", "GAN", "GANplan", "Hierarchical",
    "HierarchicalSample", "HierarchicalSampleNew", "HierAgentAware",
    "HierAgentAwareCVAE", "HierAgentAwareMPC", "GuidedHAAMPC",
    "HAASplineSampling", "AgentAwareEC", "TreeContingency", "STRIVE",
    "Diffuser", "DSPolicy", "SceneDiffuser",
]


def test_all_reference_composer_names_registered():
    missing = [n for n in REFERENCE_COMPOSERS if n not in COMPOSER_REGISTRY]
    assert missing == [], missing
    with pytest.raises(KeyError):
        get_composer("NoSuchComposer")


@pytest.fixture(scope="module")
def world():
    cfg = get_registered_experiment_config("cld_smoke")
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=2, sim_steps=20)
    sim_cfg = SimConfig(
        num_simulation_steps=20, n_step_action=5, raster_size=64,
        hist_frames=cfg.algo.history_num_frames,
    )
    obs = render_observation(pack, init_sim_state(pack, sim_cfg), sim_cfg)
    return cfg, pack, sim_cfg, obs


@pytest.mark.parametrize("name", REFERENCE_COMPOSERS)
def test_composer_builds_and_acts(name, world):
    cfg, pack, sim_cfg, obs = world
    policy = get_composer(name)(cfg, pack, sim_cfg, ckpts=None,
                                rng=jax.random.key(1))
    act = policy(obs, jax.random.key(2))
    pos = act.positions if hasattr(act, "positions") else act
    assert pos.shape[0] == pack.num_agents
    assert pos.ndim == 3 and pos.shape[-1] == 2
    if name != "GroundTruthNaN":  # NaN injection is that composer's point
        assert bool(jnp.isfinite(pos).all())
        if act.controls is not None:
            assert bool(jnp.isfinite(act.controls).all())
