"""Microbenchmark 2: decompose the ELL backward pass + scale takes.

Follow-up to tools/microbench.py and tools/gather_probe.py: finds where
the ~27ms backward goes (kernel vs permute vs reduce) and what the
per-edge scale slot-take costs, to direct the static slot-scale hoist
and backward-kernel work. Run alone on the TPU.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=96)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops.ell import (
        _bucket_offsets,
        build_fast_graph,
        make_ell_sir_aggregate_pallas,
    )
    from sir_gcn_tpu.ops.pallas import (
        bucket_bcast_act_reduce,
        bucket_bcast_act_reduce_bwd,
        bucket_scaled_reduce,
    )

    H = args.hidden
    N = 169_343
    E_RAW = 1_166_243
    it = args.iters
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E_RAW)
    dst = rng.integers(0, N, E_RAW)
    src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    graph = build_graph(src, dst, N, pad_multiple=1024)
    fg = build_fast_graph(graph)
    plan = fg.dst_plan
    splan = fg.src_plan
    S1 = plan.num_slots
    log(f"slots={S1} buckets1={plan.buckets1}")

    act = lambda x: jax.nn.leaky_relu(x, 0.2)
    eq = jnp.asarray(rng.normal(size=(graph.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(graph.n_pad, H)), jnp.float32)
    gN = jnp.asarray(rng.normal(size=(graph.n_pad, H)), jnp.float32)
    scale = fg.edge_mask.astype(jnp.float32)

    def chain(body):
        @jax.jit
        def run(x):
            def step(i, carry):
                x, acc = carry
                out = body(x)
                return ((x * (1.0 + 1e-20 * out)).astype(x.dtype),
                        acc + out.astype(jnp.float32))
            return jax.lax.fori_loop(0, it, step, (x, jnp.zeros(())))
        return run

    def timeit(name, fn, x0):
        t0 = time.time()
        out = fn(x0)
        jax.block_until_ready(out)
        comp = time.time() - t0
        out = fn(x0)
        _ = float(out[1])
        t0 = time.time()
        out = fn(x0)
        _ = float(out[1])
        dt = (time.time() - t0) / it * 1e3
        log(f"{name:44s} {dt:8.3f} ms  (compile {comp:.1f}s)")
        return dt

    # -- scale-related takes ------------------------------------------
    es = jnp.asarray(rng.normal(size=(graph.e_pad,)), jnp.float32)
    timeit("scale slot take (edge_scale by slot_edge)",
           chain(lambda x: (jnp.take(x, plan.slot_edge, axis=0)
                            * plan.slot_valid).sum()), es)
    timeit("eq rows take [R1,H]",
           chain(lambda x: jnp.take(x, plan.row_key, axis=0).sum()), eq)
    timeit("g_z permute take [S,H] bf16 (dst->src slot)",
           chain(lambda x: jnp.take(x, fg.src_slot_from_dst_slot, axis=0)
                 .astype(jnp.float32).sum()),
           jnp.zeros((S1, H), jnp.bfloat16) + 0.5)

    # -- forward kernels (pre-gathered, varying input) ----------------
    ekb = ek.astype(jnp.bfloat16)
    ekg = jnp.take(ekb, fg.dst_slot_srcnode, axis=0)
    eq_rows = jnp.take(eq, plan.row_key, axis=0)
    s_slots = (jnp.take(scale, plan.slot_edge, axis=0) * plan.slot_valid)
    offs_d = _bucket_offsets(plan.buckets1)
    offs_s = _bucket_offsets(splan.buckets1)

    def fwd_kernels(x):
        rows = []
        for b, nr, so, ro in offs_d:
            rows.append(bucket_bcast_act_reduce(
                x[so:so + b * nr], eq_rows[ro:ro + nr],
                s_slots[so:so + b * nr].reshape(nr, b), b, act))
        return (jnp.concatenate(rows) if len(rows) > 1 else rows[0]).sum()

    timeit("fwd kernels (varying ekg)", chain(fwd_kernels), ekg)

    # -- backward kernels alone (varying g) ---------------------------
    def bwd_kernels(g):
        g_rows1 = jnp.take(g, plan.row_key, axis=0)
        acc = jnp.zeros((), jnp.float32)
        for b, nr, so, ro in offs_d:
            gz, geq = bucket_bcast_act_reduce_bwd(
                ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                s_slots[so:so + b * nr].reshape(nr, b),
                g_rows1[ro:ro + nr], b, act, gz_dtype=jnp.bfloat16)
            acc = acc + gz.astype(jnp.float32).sum() + geq.sum()
        return acc

    timeit("bwd kernels (varying g)", chain(bwd_kernels), gN)

    # -- backward: concat variant (what f_bwd actually does) ----------
    def bwd_kernels_concat(g):
        g_rows1 = jnp.take(g, plan.row_key, axis=0)
        gzs, geqs = [], []
        for b, nr, so, ro in offs_d:
            gz, geq = bucket_bcast_act_reduce_bwd(
                ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                s_slots[so:so + b * nr].reshape(nr, b),
                g_rows1[ro:ro + nr], b, act, gz_dtype=jnp.bfloat16)
            gzs.append(gz)
            geqs.append(geq)
        g_z = jnp.concatenate(gzs) if len(gzs) > 1 else gzs[0]
        g_eqr = jnp.concatenate(geqs) if len(geqs) > 1 else geqs[0]
        return g_z.astype(jnp.float32).sum() + g_eqr.sum()

    timeit("bwd kernels + concat", chain(bwd_kernels_concat), gN)

    # -- src-side reduce (varying slot values) ------------------------
    sv = splan.slot_valid
    g_z_src0 = jnp.zeros((splan.num_slots, H), jnp.bfloat16) + 0.5

    def src_reduce(x):
        rows = []
        for b, nr, so, ro in offs_s:
            rows.append(bucket_scaled_reduce(
                x[so:so + b * nr], sv[so:so + b * nr].reshape(nr, b), b))
        r = jnp.concatenate(rows) if len(rows) > 1 else rows[0]
        return splan.finalize_rows_sum(r).sum()

    timeit("src-side reduce + finalize", chain(src_reduce), g_z_src0)

    # -- full fwd+bwd, 3 chained layers (defeats loop-invariant CSE of
    #    everything except the static scale — like the real step) -----
    f = make_ell_sir_aggregate_pallas(fg, act, "sum",
                                      edge_dtype=jnp.bfloat16)
    e_dummy = jnp.zeros((0,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(H, H)) / np.sqrt(H), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H, H)) / np.sqrt(H), jnp.float32)

    def three_layers(x):
        def lossf(x):
            h = x
            for _ in range(3):
                h = f(h @ w1, h @ w2, e_dummy, scale)
            return h.sum()
        return jax.grad(lossf)(x).sum()

    t3 = timeit("3-layer fwd+bwd (grad wrt input)", chain(three_layers),
                eq)
    log("-" * 60)
    log(f"per-layer fwd+bwd in context: {t3 / 3:.1f} ms")


if __name__ == "__main__":
    main()
