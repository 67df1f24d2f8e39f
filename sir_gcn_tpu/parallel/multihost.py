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

# Bare auto-initialize is only attempted on EVIDENCE OF >1 WORKER,
# because partially-populated cluster envs can make initialize() BLOCK on
# a coordinator connection instead of raising (hanging single-process
# runs). Mere presence of TPU_WORKER_ID is not evidence: single-host
# Cloud TPU VMs commonly export TPU_WORKER_ID=0, so it counts only when
# it is nonzero or TPU_WORKER_HOSTNAMES lists more than one host. A pod
# environment that exports none of the signals below must pass
# ``auto=True`` (or explicit coordinator args) — otherwise each host
# silently runs as an independent single-process runtime.
_COORDINATOR_ENV_VARS = (
    "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def _multiworker_env(env=None) -> bool:
    """True iff the environment shows evidence of MORE THAN ONE worker."""
    env = os.environ if env is None else env
    if any(v in env for v in _COORDINATOR_ENV_VARS):
        return True
    hostnames = [h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",")
                 if h.strip()]
    if len(hostnames) > 1:
        return True
    for var in ("TPU_WORKER_ID", "CLOUD_TPU_TASK_ID"):
        try:
            if int(env.get(var, "0")) > 0:
                return True  # worker k>0 implies >=k+1 workers
        except ValueError:
            pass
    for var in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(env.get(var, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> dict:
    """Initialize jax.distributed and report the global topology.

    Explicit arguments always initialize (failures propagate). With no
    arguments, auto-detection runs when ``auto=True`` (failures propagate
    — the caller asked for a cluster) or when the environment shows
    evidence of more than one worker (see :func:`_multiworker_env`;
    failures warn loudly and fall back to single-process); otherwise the
    runtime stays single-process without touching jax.distributed."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif num_processes is None and auto:
        # The caller explicitly asked for multi-host: a failed initialize
        # must NOT degrade to N independent single-process runs (for
        # full-graph training that is silently wrong results, not a
        # crash) — propagate the error.
        jax.distributed.initialize()
    elif num_processes is None and _multiworker_env():
        try:
            jax.distributed.initialize()
        except Exception as exc:  # leftover cluster env on a single host
            import warnings
            warnings.warn(
                "Environment shows evidence of a multi-worker cluster but "
                f"jax.distributed.initialize() failed ({exc!r}); continuing "
                "SINGLE-PROCESS. If this host is part of a real pod, every "
                "worker is now training independently — results will be "
                "wrong. Pass auto=True or explicit coordinator args to make "
                "this fatal.", RuntimeWarning, stacklevel=2)
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
