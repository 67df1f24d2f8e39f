"""Bisect the SIREConv full-graph-scale XLA compile blowup (round 4).

r3bench2.py section F2 measured: `make_ell_sir_aggregate_pallas(
with_edge=True)` fwd+bwd at 2.5M edges / H=96 compiles for >25 minutes
(twice reproduced, killed) — originally the motivation for an
EDGE_FEATURE_EDGE_LIMIT hard raise in ops/message_passing.py. This
probe compiles ONE variant per process (so a hung compile is killed by
the caller's `timeout` without losing the other measurements) and
prints the AOT compile wall time.

ROUND-4 RESULT (logs in stats10/r4logs/probe_*.log): the bare step
compiles in ~90-170 s and runs ~120 ms/iter; only the CHAINED shape
(grad_fori: 10 grad steps in one jit — r3bench2's timing harness)
reproduces the blowup, chunked or not. The guard is now a loud
once-per-size warning and the edge-cotangent take auto-chunks above
1M edges (see ops/ell.py set_edge_cotangent_chunks).

Variants:
  noedge      fwd+bwd, no edge features (baseline compile time)
  fwd         with_edge, forward only
  grad_eq     with_edge, grad wrt eq only (g_e chain DCE-able)
  grad_all    with_edge, grad wrt (eq, ek, e) — the real SIREConv case
  grad_all_chunked  same, with the [E_pad, H] edge-cotangent take
                    chunked via lax.map (the candidate fix)

Usage:
  timeout 420 python tools/edge_compile_probe.py --variant grad_all \
      --edges 1166243 [--chunks 16]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["noedge", "fwd", "grad_eq", "grad_all",
                             "grad_all_chunked", "grad_fori",
                             "grad_fori_chunked", "time_step",
                             "time_step_chunked", "time_step_noedge"])
    ap.add_argument("--edges", type=int, default=1_166_243,
                    help="raw edge count before bidirect+self-loops "
                         "(arxiv = 1166243 -> ~2.5M padded)")
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--hidden", type=int, default=96)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    cli = ap.parse_args()

    import jax

    if cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops.ell import (
        build_fast_graph,
        make_ell_sir_aggregate_pallas,
    )
    import sir_gcn_tpu.ops.ell as ell_mod

    N, H = cli.nodes, cli.hidden
    rng = np.random.default_rng(0)

    t0 = time.time()
    float(jnp.zeros(8).sum())
    log(f"probe in {time.time() - t0:.1f}s on {jax.devices()[0]}")

    src = rng.integers(0, N, cli.edges)
    dst = rng.integers(0, N, cli.edges)
    src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    t0 = time.time()
    g = build_graph(src, dst, N, pad_multiple=1024)
    fg = build_fast_graph(g)
    log(f"graph: e_pad={g.e_pad} n_pad={g.n_pad} "
        f"(built in {time.time() - t0:.1f}s)")

    if cli.variant in ("grad_all_chunked", "grad_fori_chunked",
                       "time_step_chunked"):
        ell_mod.set_edge_cotangent_chunks(cli.chunks)

    with_edge = cli.variant not in ("noedge", "time_step_noedge")
    f = make_ell_sir_aggregate_pallas(
        fg, jnp.tanh, "sym", with_edge=with_edge,
        edge_dtype=jnp.bfloat16, static_scale=True)

    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    valid = g.edge_mask.astype(jnp.float32)
    e_feat = (jnp.asarray(rng.normal(size=(g.e_pad, H)), jnp.float32)
              if with_edge else jnp.zeros((0,), jnp.float32))

    if cli.variant.startswith("time_step"):
        # single-dispatch step timing (RPC noise ~10-50 ms; adequate for
        # a guard-message cost quote): grads reduced to ONE scalar so
        # fetching it is a true barrier over the relay
        argnums = (0, 1, 2) if with_edge else (0, 1)

        def scalar_step(a, b, e):
            gs = jax.grad(
                lambda a_, b_, e_: jnp.sum(f(a_, b_, e_, valid) * w),
                argnums=argnums)(a, b, e)
            return sum(jnp.sum(x) for x in gs)

        fn = jax.jit(scalar_step)
        args = (eq, ek, e_feat)
        t0 = time.time()
        lowered = fn.lower(*args)
        compiled = lowered.compile()
        log(f"lower+compile in {time.time() - t0:.1f}s")
        times = []
        for i in range(6):
            t0 = time.time()
            float(compiled(*args))
            times.append(time.time() - t0)
        times_ms = [round(t * 1e3, 1) for t in times]
        med = sorted(times[1:])[len(times[1:]) // 2] * 1e3
        log(f"dispatch times ms: {times_ms}; median(last5) {med:.1f}")
        print(f'{{"variant": "{cli.variant}", "e_pad": {g.e_pad}, '
              f'"median_ms": {med:.1f}}}')
        return

    if cli.variant in ("grad_fori", "grad_fori_chunked"):
        # the r3bench2.py F2 harness shape that measured >25 min:
        # 10 grad iterations chained inside ONE jit via fori_loop
        def fn_(eq, ek):
            def body(i, carry):
                eq_c, acc = carry
                out = jax.grad(
                    lambda a, b: jnp.sum(f(a, b, e_feat, valid) * w),
                    argnums=0)(eq_c, ek)
                return (eq_c * (1.0 + 1e-20 * out[0, 0]),
                        acc + out[0, 0])
            return jax.lax.fori_loop(0, 10, body, (eq, jnp.zeros(())))

        fn = jax.jit(fn_)
        args = (eq, ek)
    elif cli.variant == "fwd":
        fn = jax.jit(lambda a, b, e: jnp.sum(f(a, b, e, valid) * w))
        args = (eq, ek, e_feat)
    elif cli.variant == "grad_eq":
        fn = jax.jit(jax.grad(
            lambda a, b, e: jnp.sum(f(a, b, e, valid) * w), argnums=0))
        args = (eq, ek, e_feat)
    else:  # noedge / grad_all / grad_all_chunked
        argnums = (0, 1) if cli.variant == "noedge" else (0, 1, 2)
        fn = jax.jit(jax.grad(
            lambda a, b, e: jnp.sum(f(a, b, e, valid) * w),
            argnums=argnums))
        args = (eq, ek, e_feat)

    t0 = time.time()
    lowered = fn.lower(*args)
    t_lower = time.time() - t0
    log(f"lowered in {t_lower:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    log(f"COMPILED in {t_compile:.1f}s")
    t0 = time.time()
    out = compiled(*args)
    jax.block_until_ready(out)
    t_run = time.time() - t0
    log(f"first run {t_run:.1f}s")
    print(f'{{"variant": "{cli.variant}", "e_pad": {g.e_pad}, '
          f'"lower_s": {t_lower:.1f}, "compile_s": {t_compile:.1f}, '
          f'"first_run_s": {t_run:.1f}}}')


if __name__ == "__main__":
    main()
