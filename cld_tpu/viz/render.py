"""Rendering utilities.

Capability parity with the reference's visualization stack:
`TrajectoryVisualizationCallback.vis_in_out`
(`/root/reference/configs/visualize_traj.py:82-181`, VAE recon vs GT over the
raster), the rollout renderer (`scene_edit_utils.py:943-1100`
UnifiedRenderer + draw helpers) and video export (`utils/vis_utils.py:373`).
Matplotlib, headless (Agg).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from cld_tpu.ops.geometry import transform_points  # noqa: E402


def _composite_raster(image: np.ndarray) -> np.ndarray:
    """[H, W, C] raster stack -> displayable RGB: drivable layer as
    background, agent history channels overlaid (ego red, others blue)."""
    H, W, C = image.shape
    sem = image[..., -3:]  # semantic layers
    hist = image[..., :-3]  # history channels
    rgb = np.zeros((H, W, 3), dtype=np.float32)
    rgb[..., :] = 0.25 + 0.5 * sem[..., 0:1]  # drivable band in gray
    ego = (hist > 0.5).any(axis=-1)
    others = (hist < -0.5).any(axis=-1)
    rgb[others] = [0.2, 0.4, 1.0]
    rgb[ego] = [1.0, 0.2, 0.2]
    return np.clip(rgb, 0, 1)


def render_batch_prediction(
    batch,
    pred_positions: Optional[np.ndarray] = None,
    indices: Sequence[int] = (0,),
    out_path: Optional[str] = None,
):
    """GT future vs prediction over the raster (`visualize_traj.py:82-181`).

    pred_positions: [B, T, 2] agent-frame predicted positions (optional).
    Returns the matplotlib figure (saved to out_path when given).
    """
    n = len(indices)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 5), squeeze=False)
    image = np.asarray(batch.image)
    rfa = np.asarray(batch.raster_from_agent)
    gt = np.asarray(batch.target_positions)
    import jax.numpy as jnp

    for ax, i in zip(axes[0], indices):
        ax.imshow(_composite_raster(image[i]), origin="upper")
        gt_px = np.asarray(transform_points(jnp.asarray(gt[i][None]), jnp.asarray(rfa[i][None])))[0]
        ax.plot(gt_px[:, 0], gt_px[:, 1], "g-", lw=2, label="GT")
        if pred_positions is not None:
            pr = np.asarray(pred_positions[i])
            pr_px = np.asarray(
                transform_points(jnp.asarray(pr[None]), jnp.asarray(rfa[i][None]))
            )[0]
            ax.plot(pr_px[:, 0], pr_px[:, 1], "y--", lw=2, label="pred")
        ax.legend(loc="upper right")
        ax.set_title(f"sample {i}")
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
    return fig


def render_scene_rollout(
    pack,
    trajectories: np.ndarray,
    out_path: Optional[str] = None,
    scene: int = 0,
    upto_step: Optional[int] = None,
    figsize: float = 8.0,
):
    """World-frame rollout plot: drivable map + per-agent trajectories
    (controlled solid, replay dashed)."""
    traj = np.asarray(trajectories)  # [T, Na, 4]
    if upto_step is not None:
        traj = traj[:upto_step]
    scene_index = np.asarray(pack.scene_index)
    controlled = np.asarray(pack.controlled_mask)
    world_map = np.asarray(pack.world_map[scene])
    origin = np.asarray(pack.map_origin[scene])
    res = pack.map_resolution
    Hw, Ww = world_map.shape[:2]

    fig, ax = plt.subplots(figsize=(figsize, figsize))
    extent = [origin[0], origin[0] + Ww * res, origin[1], origin[1] + Hw * res]
    ax.imshow(
        0.25 + 0.5 * world_map[..., 0], origin="lower", extent=extent,
        cmap="gray", vmin=0, vmax=1,
    )
    for a in np.nonzero(scene_index == scene)[0]:
        style = "-" if controlled[a] else "--"
        color = "tab:red" if controlled[a] else "tab:blue"
        ax.plot(traj[:, a, 0], traj[:, a, 1], style, color=color, lw=1.5)
        ax.plot(traj[-1, a, 0], traj[-1, a, 1], "o", color=color, ms=5)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title(f"scene {scene}: controlled (red), replay (blue)")
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
    return fig


def save_rollout_gif(
    pack, trajectories: np.ndarray, out_path: str, scene: int = 0,
    stride: int = 5, figsize: float = 8.0,
):
    """Animated rollout GIF (`vis_utils.py:373` video export equivalent).
    ``stride`` mirrors the reference's --save_every_n_frames."""
    from PIL import Image

    frames = []
    T = np.asarray(trajectories).shape[0]
    for t in range(stride, T + 1, stride):
        fig = render_scene_rollout(
            pack, trajectories, scene=scene, upto_step=t, figsize=figsize
        )
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(Image.fromarray(buf))
        plt.close(fig)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    frames[0].save(
        out_path, save_all=True, append_images=frames[1:], duration=200, loop=0
    )
    return out_path
