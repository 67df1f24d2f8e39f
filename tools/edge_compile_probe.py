"""Bisect the SIREConv full-graph-scale XLA compile blowup (round 4).

r3bench2.py section F2 measured: `make_ell_sir_aggregate_pallas(
with_edge=True)` fwd+bwd at 2.5M edges / H=96 compiles for >25 minutes
(twice reproduced, killed) — the motivation for the
EDGE_FEATURE_EDGE_LIMIT scale guard in ops/message_passing.py. This
probe compiles ONE variant per process (so a hung compile is killed by
the caller's `timeout` without losing the other measurements) and
prints the AOT compile wall time.

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
                             "grad_all_chunked"])
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

    if cli.variant == "grad_all_chunked":
        ell_mod.set_edge_cotangent_chunks(cli.chunks)

    with_edge = cli.variant != "noedge"
    f = make_ell_sir_aggregate_pallas(
        fg, jnp.tanh, "sym", with_edge=with_edge,
        edge_dtype=jnp.bfloat16, static_scale=True)

    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    valid = g.edge_mask.astype(jnp.float32)
    e_feat = (jnp.asarray(rng.normal(size=(g.e_pad, H)), jnp.float32)
              if with_edge else jnp.zeros((0,), jnp.float32))

    if cli.variant == "fwd":
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
