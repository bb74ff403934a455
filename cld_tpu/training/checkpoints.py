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
