"""Visualization smoke tests (headless Agg)."""

import os

import jax
import numpy as np

from cld_tpu.data.synthetic import synthetic_batch
from cld_tpu.policies.hardcoded import constant_policy
from cld_tpu.sim.env import SimConfig, simulate
from cld_tpu.sim.scene import synthetic_scene_pack
from cld_tpu.viz.render import (
    render_batch_prediction,
    render_scene_rollout,
    save_rollout_gif,
)


def test_render_batch_prediction(tmp_path):
    batch = synthetic_batch(seed=0, batch_size=2, raster_size=64)
    pred = np.asarray(batch.target_positions) + 1.0
    out = str(tmp_path / "pred.png")
    fig = render_batch_prediction(batch, pred, indices=(0, 1), out_path=out)
    assert os.path.exists(out) and os.path.getsize(out) > 5000


def test_render_rollout_and_gif(tmp_path):
    pack = synthetic_scene_pack(seed=0, num_scenes=1, agents_per_scene=3, sim_steps=20)
    cfg = SimConfig(num_simulation_steps=20, n_step_action=5, raster_size=32, hist_frames=4)
    _, traj = simulate(pack, constant_policy(0.0, 0.0), jax.random.key(0), cfg)
    out = str(tmp_path / "scene.png")
    render_scene_rollout(pack, np.asarray(traj), out_path=out)
    assert os.path.getsize(out) > 5000
    gif = save_rollout_gif(pack, np.asarray(traj), str(tmp_path / "roll.gif"), stride=10)
    assert os.path.getsize(gif) > 2000
