"""Persistent XLA compilation cache (round 4 cold-start work).

The tunneled TPU runtime pays real wall-clock for every first-in-process
compile: ~0.3-1.5 s per small executable (the ELL plan-upload split
fns), ~100 s for the full train step. JAX's persistent compilation
cache serializes compiled executables to disk, so those costs are paid
once per *container* instead of once per process — measured on the axon
backend: a 0.84 s compile loads in 0.10 s from a warm cache
(tools/edge_compile_probe.py-era probe, ROADMAP round 4).

Opt out with SIR_GCN_NO_COMPILE_CACHE=1 (e.g. when measuring true
cold-compile costs).

Because min_compile_time/min_entry_size are zeroed, EVERY executable is
cached and JAX performs no eviction: the directory grows without bound
across shapes and sessions (~tens of MB per distinct graph size here).
It is a pure cache — deleting ~/.cache/sir_gcn_tpu at any time is safe
and merely restores cold-compile costs for the next process.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache for this process.

    Call before the first jitted computation (any time before works, but
    executables compiled earlier are not retro-cached). Returns the
    cache directory, or None when disabled via SIR_GCN_NO_COMPILE_CACHE.
    """
    if os.environ.get("SIR_GCN_NO_COMPILE_CACHE"):
        return None
    import jax

    path = path or os.environ.get(
        "SIR_GCN_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sir_gcn_tpu",
                     "xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache small executables too: the plan-upload split fns compile in
    # ~0.3-1.5 s each, which is exactly the cold-start cost being cut
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
