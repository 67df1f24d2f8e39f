"""Overlap witness for the boundary-only halo exchange (VERDICT r3 item 4).

Compiles the halo forward (+backward) over a device mesh and inspects the
compiled module for the SCHEDULING evidence of interior/exchange overlap:

  * does XLA emit the boundary ``all_to_all`` as an ASYNC pair
    (``all-to-all-start`` ... ``all-to-all-done``)?
  * if yes, which ops sit between start and done in the module's
    instruction order — interior bucket reductions there mean the
    scheduler placed local compute inside the communication window;
  * if no (synchronous emission), overlap cannot happen on this backend
    and the probe says so.

What each backend can witness:
  * CPU virtual mesh (default here, 8 devices): XLA:CPU emits
    synchronous collectives — the probe documents that a CPU trace can
    NOT witness concurrency either way (the result recorded in ROADMAP).
  * A real multi-chip TPU slice: the compiled module text includes the
    TPU schedule; async start/done pairs with interior fusions between
    them are the single-chip-visible witness that the scheduler overlaps
    (actual concurrent execution would additionally need a profiler
    trace). This is the configuration this probe is written for; it is
    hardware-blocked on the single tunneled chip available here.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python tools/overlap_probe.py
"""

from __future__ import annotations

import re
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def analyze(hlo: str, label: str) -> dict:
    """Classify the all-to-all emission in an HLO module text."""
    lines = hlo.splitlines()
    starts = [i for i, l in enumerate(lines) if "all-to-all-start(" in l]
    dones = [i for i, l in enumerate(lines) if "all-to-all-done(" in l]
    # synchronous emission: plain all-to-all (array- OR tuple-typed —
    # XLA:CPU emits a tuple of per-peer blocks)
    sync = [i for i, l in enumerate(lines)
            if "all-to-all(" in l and " = " in l]
    out = {"label": label, "async_pairs": min(len(starts), len(dones)),
           "sync_collectives": len(sync), "between": []}
    for s in starts:
        d = next((j for j in dones if j > s), None)
        if d is None:
            continue
        between_ops = [l.strip().split(" = ")[0] for l in lines[s + 1:d]
                       if " = " in l]
        out["between"].append(between_ops)
    log(f"[{label}] all-to-all emission: {out['async_pairs']} async "
        f"start/done pair(s), {len(sync)} synchronous instruction(s)")
    for k, ops in enumerate(out["between"]):
        interior = [o for o in ops
                    if any(t in o for t in ("fusion", "reduce", "custom"))]
        log(f"[{label}]   pair {k}: {len(ops)} instruction(s) between "
            f"start and done; {len(interior)} compute-like "
            f"(fusion/reduce/custom-call)")
        if interior[:6]:
            log(f"[{label}]   e.g. {interior[:6]}")
    if not starts and sync:
        log(f"[{label}] collectives are SYNCHRONOUS on this backend — "
            f"overlap cannot be witnessed (or refuted) from this "
            f"module; a multi-chip TPU schedule is required")
    return out


def main():
    import os

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sir_gcn_tpu import build_graph
    from sir_gcn_tpu.parallel import make_mesh
    from sir_gcn_tpu.parallel.halo import (
        build_halo_fast_graph,
        make_halo_sir_aggregate,
    )

    n_dev = min(jax.device_count(), 8)
    log(f"backend: {jax.default_backend()}, {n_dev} devices")
    rng = np.random.default_rng(0)
    n, e, h = 64 * n_dev, 16 * 64 * n_dev, 32
    dst = rng.integers(0, n, e)
    local = rng.random(e) < 0.8
    base = (dst // 32) * 32
    src = np.where(local, base + rng.integers(0, 32, e),
                   rng.integers(0, n, e))
    g = build_graph(src.astype(np.int64), dst.astype(np.int64), n,
                    n_pad=n, e_pad=e)
    hfg = build_halo_fast_graph(g, n_dev, agg_type="sum")
    mesh = make_mesh((n_dev,), ("graph",))
    f = make_halo_sir_aggregate(hfg, jnp.tanh, mesh)
    sh = NamedSharding(mesh, P("graph"))
    eq = jax.device_put(jnp.zeros((n, h), jnp.float32), sh)
    ek = jax.device_put(jnp.zeros((n, h), jnp.float32), sh)

    fwd = jax.jit(f).lower(eq, ek).compile().as_text()
    analyze(fwd, "halo forward")

    def loss(a, b):
        return jnp.sum(f(a, b))

    bwd = (jax.jit(jax.grad(loss, argnums=(0, 1)))
           .lower(eq, ek).compile().as_text())
    analyze(bwd, "halo fwd+bwd")


if __name__ == "__main__":
    main()
