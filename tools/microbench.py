"""Microbenchmark: decompose the bench.py step time into components.

Times each stage of the ELL fast path at ogbn-arxiv scale on the real
TPU (chained inside one jit; scalar fetch as the completion barrier —
see CLAUDE.md on tunnel timing). Run while NO other TPU process is up.

Usage: python tools/microbench.py [--hidden 96] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, state0, iters):
    import jax

    t0 = time.time()
    out = fn(state0)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    # second warmup: the first timed dispatch in a process can catch a
    # multi-second tunnel stall (measured; see ROADMAP)
    out = fn(state0)
    _ = float(out[1] if isinstance(out, tuple) else out)
    t0 = time.time()
    out = fn(state0)
    _ = float(out[1] if isinstance(out, tuple) else out)
    dt = (time.time() - t0) / iters * 1e3
    log(f"{name:34s} {dt:8.3f} ms/iter   (compile {compile_s:.1f}s)")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=96)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--edges", type=int, default=1_166_243)
    p.add_argument("--nodes", type=int, default=169_343)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops.ell import (
        _bucket_offsets,
        build_fast_graph,
        make_ell_sir_aggregate_pallas,
    )
    from sir_gcn_tpu.ops.pallas import bucket_bcast_act_reduce

    H = args.hidden
    N = args.nodes
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, args.edges)
    dst = rng.integers(0, N, args.edges)
    src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    graph = build_graph(src, dst, N, pad_multiple=1024)
    fg = build_fast_graph(graph)
    plan = fg.dst_plan
    S1 = plan.num_slots
    R1 = plan.row_key.shape[0]
    log(f"N_pad={graph.n_pad} E_pad={graph.e_pad} slots={S1} rows1={R1} "
        f"buckets1={plan.buckets1} stage2={'Y' if plan.s2_gather is not None else 'N'}")

    act = lambda x: jax.nn.leaky_relu(x, 0.2)
    ek = jnp.asarray(rng.normal(size=(graph.n_pad, H)), jnp.float32)
    eq = jnp.asarray(rng.normal(size=(graph.n_pad, H)), jnp.float32)
    scale = fg.edge_mask.astype(jnp.float32)
    it = args.iters

    def chain(body):
        """Chain `iters` dependent evaluations inside one jit."""
        @jax.jit
        def run(x):
            def step(i, carry):
                x, acc = carry
                out = body(x)
                return ((x * (1.0 + 1e-20 * out)).astype(x.dtype),
                        acc + out.astype(jnp.float32))
            return jax.lax.fori_loop(0, it, step, (x, jnp.zeros(())))
        return run

    # 1. slot gather alone (bf16): the ek -> slot take
    ekb = ek.astype(jnp.bfloat16)
    t_gather = timeit(
        "slot gather take [S1,H] bf16",
        chain(lambda x: jnp.take(x, fg.dst_slot_srcnode, axis=0)
              .astype(jnp.float32).sum()),
        ekb, it)

    t_gather32 = timeit(
        "slot gather take [S1,H] f32",
        chain(lambda x: jnp.take(x, fg.dst_slot_srcnode, axis=0).sum()),
        ek, it)

    # 2. forward kernels on pre-gathered slots (bcast+act+reduce)
    ekg = jnp.take(ekb, fg.dst_slot_srcnode, axis=0)
    eq_rows = jnp.take(eq, plan.row_key, axis=0)
    s_slots = plan.gather_edges(scale) * plan.slot_valid
    offs = _bucket_offsets(plan.buckets1)

    def kernels_only(x):
        rows = []
        for b, nr, so, ro in offs:
            rows.append(bucket_bcast_act_reduce(
                x[so:so + b * nr], eq_rows[ro:ro + nr],
                s_slots[so:so + b * nr].reshape(nr, b), b, act))
        r = jnp.concatenate(rows) if len(rows) > 1 else rows[0]
        return r.sum()

    t_kern = timeit("fwd kernels (pre-gathered)", chain(kernels_only),
                    ekg, it)

    # 3. finalize (stage2 + key2row lookup)
    rows1 = jnp.asarray(rng.normal(size=(R1, H)), jnp.float32)
    t_fin = timeit("finalize rows -> nodes",
                   chain(lambda x: plan.finalize_rows_sum(x).sum()),
                   rows1, it)

    # 4. full fwd aggregate
    f = make_ell_sir_aggregate_pallas(fg, act, "sum",
                                      edge_dtype=jnp.bfloat16)
    e_dummy = jnp.zeros((0,), jnp.float32)
    t_fwd = timeit(
        "full aggregate fwd",
        chain(lambda x: f(eq, x, e_dummy, scale).sum()), ek, it)

    # 5. full fwd+bwd
    g = jax.grad(lambda q, k: f(q, k, e_dummy, scale).sum(),
                 argnums=(0, 1))
    t_fb = timeit(
        "full aggregate fwd+bwd",
        chain(lambda x: sum(t.sum() for t in g(eq, x))), ek, it)

    # 5b. XLA-ELL variant (no pallas): can XLA's fusion beat the kernels?
    from sir_gcn_tpu.ops.ell import make_ell_sir_aggregate

    fx = make_ell_sir_aggregate(fg, act, "sum")
    t_xfwd = timeit(
        "XLA-ELL aggregate fwd",
        chain(lambda x: fx(eq, x, e_dummy, scale).sum()), ek, it)
    gx = jax.grad(lambda q, k: fx(q, k, e_dummy, scale).sum(),
                  argnums=(0, 1))
    t_xfb = timeit(
        "XLA-ELL aggregate fwd+bwd",
        chain(lambda x: sum(t.sum() for t in gx(eq, x))), ek, it)

    # 6. node GEMM (the three linears' scale)
    w = jnp.asarray(rng.normal(size=(H, H)), jnp.float32)
    t_gemm = timeit("node GEMM [N,H]x[H,H]",
                    chain(lambda x: (x @ w).sum()), ek, it)

    # 7. dropout on [N, H]
    key = jax.random.PRNGKey(0)
    t_drop = timeit(
        "dropout [N,H] (threefry)",
        chain(lambda x: jnp.where(
            jax.random.bernoulli(key, 0.8, x.shape), x / 0.8, 0.0).sum()),
        ek, it)

    log("-" * 60)
    log(f"gather {t_gather:.1f} + kernels {t_kern:.1f} + finalize "
        f"{t_fin:.1f} = {t_gather + t_kern + t_fin:.1f} vs fwd {t_fwd:.1f}")
    log(f"fwd+bwd {t_fb:.1f} (bwd = {t_fb - t_fwd:.1f})")


if __name__ == "__main__":
    main()
