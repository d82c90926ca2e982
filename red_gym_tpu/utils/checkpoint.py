"""Checkpoint/resume for env + trainer state via orbax.

The reference's only persistence is a final ``torch.save`` of the SAC actor
(reference: src/SAL.py:1017) and envs are re-seeded rather than snapshotted
(base_classes.py:202).  Here the entire simulation is a pytree, so whole
training runs — sharded env batches included — checkpoint and resume
exactly.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save(path: str, tree: Any, step: int = 0, overwrite: bool = True):
    """Save an arbitrary pytree (EnvState batch, PPOState, SACState, ...)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=overwrite)
    return path


def restore(path: str, like: Any = None) -> Any:
    """Restore a pytree; pass ``like`` (a template with the right shapes,
    dtypes and shardings) to restore sharded arrays in place."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        template = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, item=template)
