"""Multi-host runtime entry (SURVEY §2c P5).

The reference is single-process/single-GPU; for pod-scale training the
framework initializes JAX's distributed runtime and builds a global mesh.
Call :func:`initialize_multihost` once at program start on every host
(standard TPU pod env vars are auto-detected by jax.distributed)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from .mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed and report the global topology.

    With no arguments, jax.distributed.initialize() runs its own cluster
    auto-detection (TPU pod metadata / standard env vars); if none is
    found the runtime stays single-process. Explicit arguments override
    auto-detection."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # no cluster environment detected: single-process
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }


def make_global_mesh(axis_names: Sequence[str] = ("graph",),
                     axis_sizes=None):
    """Mesh over all global devices (call after initialize_multihost)."""
    return make_mesh(axis_sizes, axis_names)
