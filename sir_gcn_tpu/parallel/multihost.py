"""Multi-host runtime entry (SURVEY §2c P5).

The reference is single-process/single-GPU; for pod-scale training the
framework initializes JAX's distributed runtime and builds a global mesh.
Call :func:`initialize_multihost` once at program start on every host
(standard TPU pod env vars are auto-detected by jax.distributed)."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from .mesh import make_mesh

# env vars whose presence indicates a real cluster launch; bare
# auto-initialize is only attempted when one of these is set, because
# partially-populated cluster envs can make initialize() BLOCK on a
# coordinator connection instead of raising (hanging single-process runs).
# Cloud TPU pod VMs export TPU_WORKER_ID / TPU_WORKER_HOSTNAMES /
# CLOUD_TPU_TASK_ID even when the coordinator address comes from GCE
# metadata rather than the environment, so metadata-driven pod launches
# are detected too. A pod environment that exports NONE of these must
# pass ``auto=True`` (or explicit coordinator args) — otherwise each host
# silently runs as an independent single-process runtime.
_CLUSTER_ENV_VARS = (
    "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
    "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID",
    "SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE",
)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> dict:
    """Initialize jax.distributed and report the global topology.

    Explicit arguments always initialize. With no arguments,
    auto-detection runs only when ``auto=True`` or a known cluster env
    var is present (see ``_CLUSTER_ENV_VARS``); otherwise the runtime
    stays single-process without touching jax.distributed."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif num_processes is None and (
            auto or any(v in os.environ for v in _CLUSTER_ENV_VARS)):
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # no usable cluster environment: single-process
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
