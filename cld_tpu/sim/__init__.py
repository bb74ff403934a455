"""On-device closed-loop simulation: world state, rendering, rollout scan."""

from cld_tpu.sim.scene import ScenePack, synthetic_scene_pack
from cld_tpu.sim.env import SimState, render_observation, simulate, SimConfig
from cld_tpu.sim.metrics import summarize_metrics
