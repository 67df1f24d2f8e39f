"""Round-3 consolidated TPU measurements, part 2 (run alone on the TPU).

Re-runs the r3bench.py sections that hit the B=10 scoped-VMEM OOM
(fixed in kernels._tile_rows by budgeting on the sublane-PADDED middle
dim) plus the section-F variants that were cut by the process timeout.
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def section(name):
    def deco(fn):
        def run(*a, **kw):
            log(f"==== {name} ====")
            t0 = time.time()
            try:
                fn(*a, **kw)
            except Exception:
                log(f"[{name}] FAILED:")
                traceback.print_exc(file=sys.stderr)
            log(f"==== {name} done in {time.time() - t0:.0f}s ====")
        return run
    return deco


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops import set_edge_dtype
    from sir_gcn_tpu.ops.ell import (
        build_fast_graph,
        ell_sir_aggregate,
        make_ell_sir_aggregate_max,
        make_ell_sir_aggregate_pallas,
    )

    N, E_RAW = 169_343, 1_166_243
    H = 96
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
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    valid = g.edge_mask.astype(jnp.float32)
    e0 = jnp.zeros((0,), jnp.float32)

    def timed_grad(name, fn, it=10):
        @jax.jit
        def run(eq, ek):
            def body(i, carry):
                eq, acc = carry
                out = jax.grad(
                    lambda a, b: jnp.sum(fn(a, b) * w), argnums=0)(eq, ek)
                return (eq * (1.0 + 1e-20 * out[0, 0]), acc + out[0, 0])
            return jax.lax.fori_loop(0, it, body, (eq, jnp.zeros(())))

        t0 = time.time()
        _, a = run(eq, ek)
        float(a)
        log(f"  [compile+first {name}: {time.time() - t0:.0f}s]")
        t0 = time.time()
        _, a = run(eq, ek)
        float(a)
        dt = (time.time() - t0) / it * 1e3
        log(f"{name:46s} {dt:8.2f} ms/iter (fwd+bwd)")
        return dt

    @section("A: backward-take fusion A/B (fixed kernels)")
    def sec_a():
        for fuse in (False, True):
            f = make_ell_sir_aggregate_pallas(
                fg, jnp.tanh, "sym", edge_dtype=jnp.bfloat16,
                static_scale=True, fuse_bwd_take=fuse)
            timed_grad(f"pallas sym bf16 fuse_bwd_take={fuse}",
                       lambda a, b, f=f: f(a, b, e0, valid))

    @section("E2: sharded @1 Pallas local compute")
    def sec_e2():
        from sir_gcn_tpu.parallel import make_mesh
        from sir_gcn_tpu.parallel.ell_distributed import (
            build_sharded_fast_graph,
            make_sharded_sir_aggregate_pallas,
        )

        sfg = build_sharded_fast_graph(g, 1, agg_type="sym")
        mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
        f_p = make_sharded_sir_aggregate_pallas(sfg, jnp.tanh, mesh)
        timed_grad("sharded @1 (Pallas local compute)", f_p)

    @section("F1: single-dev max agg (XLA slot ops)")
    def sec_f1():
        w_rel = jnp.asarray(rng.normal(size=(H, H)) * 0.1, jnp.float32)
        b_rel = jnp.zeros((H,), jnp.float32)
        f_max_1 = make_ell_sir_aggregate_max(fg, jnp.tanh)
        timed_grad("single-dev max agg",
                   lambda a, b: f_max_1(a, b, e0, valid, w_rel, b_rel),
                   it=5)

    @section("F2: single-dev SIREConv (pallas, with_edge)")
    def sec_f2():
        e_feat = jnp.asarray(rng.normal(size=(g.e_pad, H)), jnp.float32)
        f_edge_1 = make_ell_sir_aggregate_pallas(
            fg, jnp.tanh, "sym", with_edge=True,
            edge_dtype=jnp.bfloat16, static_scale=True)
        timed_grad("single-dev SIREConv",
                   lambda a, b: f_edge_1(a, b, e_feat, valid), it=5)

    @section("F3: halo @1 SIREConv (XLA-composed)")
    def sec_f3():
        from sir_gcn_tpu.parallel import make_mesh
        from sir_gcn_tpu.parallel.halo import (
            build_halo_fast_graph,
            make_halo_sir_aggregate,
        )

        mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
        e_feat = jnp.asarray(rng.normal(size=(g.e_pad, H)), jnp.float32)
        t0 = time.time()
        hfg = build_halo_fast_graph(g, 1, agg_type="sym")
        log(f"halo fast graph @1: {time.time() - t0:.1f}s")
        f_edge = make_halo_sir_aggregate(hfg, jnp.tanh, mesh,
                                         with_edge=True, feat_width=H)
        timed_grad("halo @1 SIREConv (XLA-composed)",
                   lambda a, b: f_edge(a, b, e_feat), it=5)

    @section("F4: halo @1 max agg (XLA-composed)")
    def sec_f4():
        from sir_gcn_tpu.parallel import make_mesh
        from sir_gcn_tpu.parallel.halo import (
            build_halo_fast_graph,
            make_halo_sir_aggregate_max,
        )

        mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
        w_rel = jnp.asarray(rng.normal(size=(H, H)) * 0.1, jnp.float32)
        b_rel = jnp.zeros((H,), jnp.float32)
        hfg_m = build_halo_fast_graph(g, 1, agg_type="max")
        f_max = make_halo_sir_aggregate_max(hfg_m, jnp.tanh, mesh)
        timed_grad("halo @1 max agg (XLA-composed)",
                   lambda a, b: f_max(a, b, e0, valid, w_rel, b_rel),
                   it=5)

    sec_a()
    sec_e2()
    sec_f1()
    sec_f2()
    sec_f3()
    sec_f4()


if __name__ == "__main__":
    main()
