"""Visualization: raster-frame prediction plots + world-frame rollout renders."""

from cld_tpu.viz.render import (
    render_batch_prediction,
    render_scene_rollout,
    save_rollout_gif,
)
