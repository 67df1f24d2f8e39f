"""Round-5 pre-registered @1-shard scheduling experiment (VERDICT r4
item 5).

Round-4 isolated the sharded@1 residual (~1.0-1.3 ms/layer vs the
single-device path, 91.6-93.0% efficiency) to XLA program-shape
scheduling: a shard_map-free transcription fed the single-device plan
arrays still reproduced it, and the HLO showed per-bucket bf16
realignment copies at the pallas-input slice boundaries in one program
shape and not the other.

Hypothesis (registered before running): the copies come from XLA
materializing the full [S, H] gathered slot table and realigning each
sublane-misaligned bucket slice; slicing the int32 INDEX vector per
bucket and issuing one take per bucket forces the fused
gather-into-kernel-input form in any program shape. Total gathered rows
identical.

Protocol: one chip session, same-session single-device baseline
(chained-jit x10, min of 2 windows — the r4bench timed_grad protocol),
then sharded@1 with per_bucket_takes=False and =True. Success = >=95%
same-session; otherwise the negative result is recorded next to the
8-alignment one and the thread declared closed.

Usage: timeout 1800 python tools/r5sched.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops import set_edge_dtype
    from sir_gcn_tpu.ops.ell import build_fast_graph, ell_sir_aggregate
    from sir_gcn_tpu.parallel import make_mesh
    from sir_gcn_tpu.parallel.ell_distributed import (
        build_sharded_fast_graph,
        make_sharded_sir_aggregate_pallas,
    )

    N, E_RAW, H = 169_343, 1_166_243, 96
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.zeros(8).sum())
    log(f"probe in {time.time() - t0:.1f}s on {jax.devices()[0]}")

    src = rng.integers(0, N, E_RAW)
    dst = rng.integers(0, N, E_RAW)
    src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    g = build_graph(src, dst, N, pad_multiple=1024)
    fg = build_fast_graph(g)
    set_edge_dtype(jnp.bfloat16)

    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    it = 10

    def timed_grad(name, fn):
        @jax.jit
        def run(eq, ek):
            def body(i, carry):
                eq, acc = carry
                out = jax.grad(
                    lambda a, b: jnp.sum(fn(a, b) * w), argnums=0)(eq, ek)
                return (eq * (1.0 + 1e-20 * out[0, 0]), acc + out[0, 0])
            return jax.lax.fori_loop(0, it, body, (eq, jnp.zeros(())))

        _, a = run(eq, eq)
        float(a)
        times = []
        for _ in range(2):
            t0 = time.time()
            _, a = run(eq, eq)
            float(a)
            times.append((time.time() - t0) / it * 1e3)
        dt = min(times)
        log(f"{name:58s} {dt:8.2f} ms/iter (fwd+bwd)")
        return dt

    t_single = timed_grad(
        "single-device Pallas fast path",
        lambda a, b: ell_sir_aggregate(fg, a, b, jnp.tanh, "sym",
                                       static_scale=True))
    mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
    results = {"single_ms": round(t_single, 2)}

    if "--halo" in sys.argv:
        from sir_gcn_tpu.parallel.halo import (
            build_halo_fast_graph,
            make_halo_sir_aggregate_pallas,
        )

        t0 = time.time()
        hfg = build_halo_fast_graph(g, 1, agg_type="sym")
        log(f"halo fast graph @1: {time.time() - t0:.1f}s")
        for pbt in (False, True):
            f_h = make_halo_sir_aggregate_pallas(
                hfg, jnp.tanh, mesh, per_bucket_takes=pbt)
            t = timed_grad(f"halo @1 Pallas (per_bucket_takes={pbt})",
                           f_h)
            eff = t_single / t * 100
            log(f"  -> per-chip efficiency vs single-device: {eff:.1f}%")
            results[f"halo_pbt{int(pbt)}_ms"] = round(t, 2)
            results[f"halo_pbt{int(pbt)}_eff_pct"] = round(eff, 1)
    else:
        t0 = time.time()
        sfg = build_sharded_fast_graph(g, 1, agg_type="sym")
        log(f"sharded fast graph @1: {time.time() - t0:.1f}s")
        for pbt in (False, True):
            f_p = make_sharded_sir_aggregate_pallas(
                sfg, jnp.tanh, mesh, per_bucket_takes=pbt)
            t = timed_grad(f"sharded @1 Pallas (per_bucket_takes={pbt})",
                           f_p)
            eff = t_single / t * 100
            log(f"  -> per-chip efficiency vs single-device: {eff:.1f}%")
            results[f"sharded_pbt{int(pbt)}_ms"] = round(t, 2)
            results[f"sharded_pbt{int(pbt)}_eff_pct"] = round(eff, 1)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
