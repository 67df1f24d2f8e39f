"""Round-5 A/B: fused Pallas edge/max paths vs the XLA-composed ones at
arxiv scale (VERDICT r4 item 1 "Done" criterion).

One variant per process (a pathological compile is killed by the
caller's `timeout` without losing other rows); stats10/r5logs/ holds
the raw logs. Chained variants run K=10 fwd+bwd iterations inside ONE
jit (the only reliable timing over the tunneled runtime — CLAUDE.md);
*_step variants use single-dispatch + scalar-fetch barriers (~10-50 ms
RPC in every number — quote them only against each other, exactly like
the round-4 probe).

Variants:
  noedge_chain      baseline linear aggregate, chained x10 (the floor)
  edge_old_step     generic with_edge ([E_pad, H] projection), 1-dispatch
  edge_new_step     fused basis (De=16) path, 1-dispatch
  edge_new_chain    fused basis, chained x10 (the r3/r4 pathological
                    shape — with the fused VJP it must compile fine)
  edge_old_chain    generic with_edge, chained x10 (EXPECTED to hang;
                    run under timeout to reconfirm)
  max_old_step      XLA-composed max path, 1-dispatch
  max_new_step      Pallas max kernels, 1-dispatch
  max_new_chain     Pallas max kernels, chained x10

Usage: timeout 600 python tools/r5bench.py --variant edge_new_chain
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


K = 10  # chained iterations per jit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["noedge_chain", "edge_old_step",
                             "edge_new_step", "edge_new_chain",
                             "edge_old_chain", "max_old_step",
                             "max_new_step", "max_new_chain"])
    ap.add_argument("--edges", type=int, default=1_166_243)
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--hidden", type=int, default=96)
    ap.add_argument("--basis-dim", type=int, default=16)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--serial-chain", action="store_true",
                    help="feed EVERY cotangent back into the carry (a "
                         "real training step's dependence structure) — "
                         "the default chain consumes only one element "
                         "of the non-eq grads, which lets XLA overlap "
                         "an iteration's src-backward with the next "
                         "forward")
    cli = ap.parse_args()

    import jax

    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops.ell import (
        build_fast_graph,
        make_ell_sir_aggregate_max,
        make_ell_sir_aggregate_max_pallas,
        make_ell_sir_aggregate_pallas,
        make_ell_sir_aggregate_pallas_fused_edge,
    )

    N, H, De = cli.nodes, cli.hidden, cli.basis_dim
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

    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    valid = g.edge_mask.astype(jnp.float32)
    v = cli.variant

    # ---- build the aggregate + grad fn per variant --------------------
    # Every large array is an EXPLICIT jit argument: closing big device
    # arrays over the jit (the first r5 session's mistake) embeds them
    # as constants and blows the edge-path compile from ~150 s to >15
    # min (the r4 probe, which passes them explicitly, compiles fine in
    # the same session — 147.7 s / 122.6 ms re-measured 2026-08-21).
    if v.startswith("noedge") or v.startswith("edge"):
        if v.startswith("noedge"):
            f = make_ell_sir_aggregate_pallas(
                fg, jnp.tanh, "sym", with_edge=False,
                edge_dtype=jnp.bfloat16, static_scale=True)
            args = (eq, ek)

            def gradfn(a, b):
                return jax.grad(lambda a_, b_: jnp.sum(
                    f(a_, b_, jnp.zeros((0,), jnp.float32), valid) * w),
                    argnums=(0, 1))(a, b)
        elif "old" in v:
            f = make_ell_sir_aggregate_pallas(
                fg, jnp.tanh, "sym", with_edge=True,
                edge_dtype=jnp.bfloat16, static_scale=True)
            e_feat = jnp.asarray(rng.normal(size=(g.e_pad, H)),
                                 jnp.float32)
            args = (eq, ek, e_feat)

            def gradfn(a, b, e):
                return jax.grad(lambda a_, b_, e_: jnp.sum(
                    f(a_, b_, e_, valid) * w),
                    argnums=(0, 1, 2))(a, b, e)
        else:
            f = make_ell_sir_aggregate_pallas_fused_edge(
                fg, jnp.tanh, "sym", edge_dtype=jnp.bfloat16,
                static_scale=True)
            e_basis = jnp.asarray(rng.normal(size=(g.e_pad, De)),
                                  jnp.float32)
            w_e = jnp.asarray(rng.normal(size=(De, H)) * 0.3,
                              jnp.float32)
            args = (eq, ek, e_basis, w_e)

            def gradfn(a, b, eb, we):
                return jax.grad(lambda a_, b_, we_: jnp.sum(
                    f(a_, b_, eb, we_, valid) * w),
                    argnums=(0, 1, 2))(a, b, we)
    else:  # max paths
        O = H
        w_rel = jnp.asarray(rng.normal(size=(H, O)) * 0.2, jnp.float32)
        b_rel = jnp.zeros((O,), jnp.float32)
        gw = jnp.asarray(rng.normal(size=(g.n_pad, O)), jnp.float32)
        e0 = jnp.zeros((0,), jnp.float32)
        if "old" in v:
            f = make_ell_sir_aggregate_max(fg, jnp.tanh)
        else:
            f = make_ell_sir_aggregate_max_pallas(
                fg, jnp.tanh, edge_dtype=jnp.bfloat16)
        args = (eq, ek, w_rel)

        def gradfn(a, b, wr):
            return jax.grad(lambda a_, b_, w_: jnp.sum(
                f(a_, b_, e0, valid, w_, b_rel) * gw),
                argnums=(0, 1, 2))(a, b, wr)

    # ---- measure ------------------------------------------------------
    if v.endswith("_chain"):
        # acc consumes ONE element of EVERY cotangent: the bucket
        # kernels are opaque pallas calls, so touching any output keeps
        # the whole backward pass alive — without this, XLA DCEs the
        # unused g_ek/g_we/g_e chains and the chain measures a
        # g_eq-only backward (caught in-session round 5)
        if cli.serial_chain:
            # every grad feeds the next iteration's inputs, like a real
            # optimizer step: no cross-iteration overlap possible
            def chain(*arrs):
                def body(i, carry):
                    ins, acc = carry
                    gs = gradfn(*ins)
                    # map grads in order onto the next matching-shape
                    # input (skips non-differentiated args like e_basis)
                    upd = list(ins)
                    gi = 0
                    for j, x in enumerate(upd):
                        if gi < len(gs) and gs[gi].shape == x.shape:
                            upd[j] = x + 1e-20 * gs[gi]
                            gi += 1
                    return (tuple(upd), acc + gs[0][0, 0])
                return jax.lax.fori_loop(
                    0, K, body, (arrs, jnp.zeros(())))[1]
        else:
            def chain(*arrs):
                def body(i, carry):
                    a_c, acc = carry
                    gs = gradfn(a_c, *arrs[1:])
                    keep = sum(g.reshape(-1)[0] for g in gs)
                    return (a_c + 1e-20 * gs[0], acc + keep)
                return jax.lax.fori_loop(0, K, body,
                                         (arrs[0], jnp.zeros(())))[1]

        fn = jax.jit(chain)
        t0 = time.time()
        lowered = fn.lower(*args)
        t_lower = time.time() - t0
        log(f"lowered in {t_lower:.1f}s")
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        log(f"COMPILED in {t_compile:.1f}s")
        float(compiled(*args))  # warm
        windows = []
        for _ in range(cli.windows):
            t0 = time.time()
            float(compiled(*args))
            windows.append((time.time() - t0) / K * 1e3)
        log(f"windows ms/iter: {[round(x, 2) for x in windows]}")
        print(f'{{"variant": "{v}", "e_pad": {g.e_pad}, '
              f'"lower_s": {t_lower:.1f}, "compile_s": {t_compile:.1f}, '
              f'"ms_per_iter": {min(windows):.2f}, '
              f'"windows": {[round(x, 2) for x in windows]}}}')
    else:
        def scalar_step(*arrs):
            gs = gradfn(*arrs)
            return sum(jnp.sum(x) for x in gs)

        fn = jax.jit(scalar_step)
        t0 = time.time()
        lowered = fn.lower(*args)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        log(f"lower {t_lower:.1f}s compile {t_compile:.1f}s")
        times = []
        for i in range(8):
            t0 = time.time()
            float(compiled(*args))
            times.append(time.time() - t0)
        times_ms = [round(t * 1e3, 1) for t in times]
        med = sorted(times[2:])[len(times[2:]) // 2] * 1e3
        log(f"dispatch ms: {times_ms}; median(last6) {med:.1f}")
        print(f'{{"variant": "{v}", "e_pad": {g.e_pad}, '
              f'"lower_s": {t_lower:.1f}, "compile_s": {t_compile:.1f}, '
              f'"median_ms": {med:.1f}}}')


if __name__ == "__main__":
    main()
