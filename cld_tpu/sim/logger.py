"""Rollout logging: per-scene serialized trajectory/action buffers -> HDF5.

Capability parity with `RolloutLogger`
(`/root/reference/src/tbsim/utils/rollout_logger.py:9-253`) and the hdf5
experience dump (`rollout.py:377` experience_hdf5_path). The simulator
already returns the full world-frame trajectory log from the scan; this
class assembles episode dictionaries and serializes them.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


class RolloutLogger:
    def __init__(self, dt: float = 0.1):
        self.dt = dt
        self._episodes = []

    def log_episode(
        self,
        trajectories: np.ndarray,  # [T, Na, 4] world (x, y, v, yaw)
        scene_index: np.ndarray,
        controlled_mask: np.ndarray,
        metrics: Optional[Dict] = None,
        actions: Optional[np.ndarray] = None,  # [T, Na, 2]
    ):
        self._episodes.append(
            {
                "trajectories": np.asarray(trajectories),
                "scene_index": np.asarray(scene_index),
                "controlled_mask": np.asarray(controlled_mask),
                "metrics": metrics or {},
                "actions": None if actions is None else np.asarray(actions),
            }
        )

    def save_hdf5(self, path: str):
        """One group per episode, one subgroup per scene
        (`rollout_logger.py` buffer layout)."""
        import h5py

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with h5py.File(path, "w") as f:
            for ei, ep in enumerate(self._episodes):
                grp = f.create_group(f"episode_{ei:04d}")
                for scene in np.unique(ep["scene_index"]):
                    agents = np.nonzero(ep["scene_index"] == scene)[0]
                    sg = grp.create_group(f"scene_{int(scene):06d}")
                    sg.create_dataset("centroid", data=ep["trajectories"][:, agents, :2])
                    sg.create_dataset("speed", data=ep["trajectories"][:, agents, 2])
                    sg.create_dataset("yaw", data=ep["trajectories"][:, agents, 3])
                    sg.create_dataset("controlled", data=ep["controlled_mask"][agents])
                    if ep["actions"] is not None:
                        sg.create_dataset("actions", data=ep["actions"][:, agents])
                # np.isscalar is False for 0-d arrays / jax scalars (the
                # natural form of device-computed metrics) — keep anything
                # float() accepts instead
                kept = {}
                for k, v in ep["metrics"].items():
                    try:
                        kept[k] = float(v)
                    except (TypeError, ValueError):
                        pass
                grp.attrs["metrics"] = json.dumps(kept)
        return path

    def save_npz(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # np.savez appends '.npz' to suffix-less paths; return the REAL path
        if not path.endswith(".npz"):
            path = path + ".npz"
        np.savez(
            path,
            **{
                f"episode_{i}_traj": ep["trajectories"]
                for i, ep in enumerate(self._episodes)
            },
        )
        return path

    def __len__(self):
        return len(self._episodes)
