"""Checkpoint / resume.

The reference has **no model checkpointing** (SURVEY §5): it keeps best
metrics in memory and optionally saves prediction tensors
(``benchmark-datasets/ogbn-arxiv/train.py:205-208``) — that capability is
covered by the harnesses' ``--save-pred`` npy files. This module adds the
TPU-framework improvement: orbax checkpoints of params + optimizer state
with metadata, for long-running / multi-host training."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, step: int = 0) -> str:
    """Save a pytree (e.g. TrainState) via orbax; returns the ckpt dir."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Any,
                    step: Optional[int] = None) -> Any:
    """Restore a pytree saved with :func:`save_checkpoint`. ``target`` is a
    matching pytree of shapes/dtypes (e.g. a freshly initialized state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        return mgr.restore(step,
                           args=ocp.args.StandardRestore(target))


def latest_step(path: str) -> Optional[int]:
    """Latest saved step in a checkpoint dir, or None if none exist."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()
