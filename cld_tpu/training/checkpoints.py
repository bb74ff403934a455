"""Checkpointing via orbax.

Capability parity with the reference's Lightning checkpoint flow
(`/root/reference/utils/trainer_utils.py:30-43,59-72`,
`dm_trainer.py:94-102`): per-stage checkpoints store only that stage's
subtree (the reference filters state_dicts to `dm.*`/strips `vae.`
prefixes); cross-stage handoff restores a subtree into a fresh trainer.
Orbax makes the prefix surgery unnecessary — subtrees are saved as distinct
pytrees under named keys.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_pytree(path: str, tree: Any):
    """Save a pytree checkpoint (overwrites)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def save_train_state(path: str, state: Any, loop_step: Optional[int] = None):
    """Full-state checkpoint for true mid-training resume: params + optimizer
    moments + step counters (+ batch_stats), matching Lightning's full-state
    `ckpt_path` resume (`/root/reference/train.py:11-12`,
    `utils/trainer_utils.py:95-105`) rather than the weights-only handoff.

    `loop_step` is the outer training-loop step; it differs from state.step
    for PPO, where the optimizer steps `epochs*update_times` times per
    collection step.
    """
    import numpy as np

    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "loop_step": np.asarray(loop_step if loop_step is not None else state.step, np.int64),
    }
    bs = getattr(state, "batch_stats", None)
    if bs is not None:
        tree["batch_stats"] = bs
    save_pytree(path, tree)


def restore_train_state(path: str, state: Any):
    """Restore a full-state checkpoint into an initialized train state.
    Returns (state, loop_step)."""
    import numpy as np

    like = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "loop_step": np.asarray(0, np.int64),
    }
    bs = getattr(state, "batch_stats", None)
    if bs is not None:
        like["batch_stats"] = bs
    restored = restore_pytree(path, like=like)
    kwargs = {
        "params": restored["params"],
        "opt_state": restored["opt_state"],
        "step": restored["step"],
    }
    if "batch_stats" in restored:
        kwargs["batch_stats"] = restored["batch_stats"]
    return state.replace(**kwargs), int(restored["loop_step"])


def restore_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree; `like` provides the target structure/shardings."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        out = ckptr.restore(path, abstract)
    else:
        out = ckptr.restore(path)
    ckptr.close()
    return out
