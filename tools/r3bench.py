"""Round-3 consolidated TPU measurements (run alone on the TPU).

One process amortizes the tunnel/init cost (measured: a fresh process
can pay 10-18 min of chip re-init after a previous process exits).
Sections, each failure-isolated:

  A. backward-take fusion A/B (fuse_bwd_take True/False) at arxiv scale
  B. gather-floor decomposition: take-only vs fwd vs fwd+bwd aggregate
  C. full train step (bench.py config), 3 timed windows
  D. power-law graph: plan build timings/inflation + full step windows
  E. sharded-path re-validation @1 shard (chained jit): XLA vs Pallas
     local compute vs single-device
  F. halo @1: SIREConv edge features + max aggregation (XLA-composed
     slot ops) vs their single-device counterparts
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
        make_ell_sir_aggregate,
        make_ell_sir_aggregate_max,
        make_ell_sir_aggregate_pallas,
        plan_timings,
    )

    N, E_RAW, CLS = 169_343, 1_166_243, 40
    H = 96
    rng = np.random.default_rng(0)

    t0 = time.time()
    float(jnp.zeros(8).sum())
    log(f"probe in {time.time() - t0:.1f}s on {jax.devices()[0]}")

    src = rng.integers(0, N, E_RAW)
    dst = rng.integers(0, N, E_RAW)
    src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    t0 = time.time()
    g = build_graph(src, dst, N, pad_multiple=1024)
    fg = build_fast_graph(g)
    log(f"plans(random graph): {time.time() - t0:.1f}s  stages: "
        + ", ".join(f"{k}={v:.2f}s"
                    for k, v in sorted(plan_timings().items(),
                                       key=lambda kv: -kv[1])))
    set_edge_dtype(jnp.bfloat16)

    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    it = 10

    def timed_grad(name, fn, *extra_args):
        """fwd+bwd of sum(fn(eq, ek)*w), chained in one jit."""
        @jax.jit
        def run(eq, ek):
            def body(i, carry):
                eq, acc = carry
                out = jax.grad(
                    lambda a, b: jnp.sum(fn(a, b) * w), argnums=0)(eq, ek)
                return (eq * (1.0 + 1e-20 * out[0, 0]), acc + out[0, 0])
            return jax.lax.fori_loop(0, it, body, (eq, jnp.zeros(())))

        _, a = run(eq, ek)
        float(a)
        t0 = time.time()
        _, a = run(eq, ek)
        float(a)
        dt = (time.time() - t0) / it * 1e3
        log(f"{name:44s} {dt:8.2f} ms/iter (fwd+bwd)")
        return dt

    def timed_fwd(name, fn):
        @jax.jit
        def run(eq, ek):
            def body(i, carry):
                eq, acc = carry
                out = fn(eq, ek)
                return (eq * (1.0 + 1e-20 * out[0, 0]), acc + out[0, 0])
            return jax.lax.fori_loop(0, it, body, (eq, jnp.zeros(())))

        _, a = run(eq, ek)
        float(a)
        t0 = time.time()
        _, a = run(eq, ek)
        float(a)
        dt = (time.time() - t0) / it * 1e3
        log(f"{name:44s} {dt:8.2f} ms/iter (fwd)")
        return dt

    e0 = jnp.zeros((0,), jnp.float32)

    @section("A: backward-take fusion A/B")
    def sec_a():
        valid = g.edge_mask.astype(jnp.float32)
        for fuse in (False, True):
            f = make_ell_sir_aggregate_pallas(
                fg, jnp.tanh, "sym", edge_dtype=jnp.bfloat16,
                static_scale=True, fuse_bwd_take=fuse)
            timed_grad(f"pallas sym bf16 fuse_bwd_take={fuse}",
                       lambda a, b, f=f: f(a, b, e0, valid))

    @section("A2: budget-granularity A/B (old vs new rule)")
    def sec_a2():
        import sir_gcn_tpu.ops.ell as ell

        valid = g.edge_mask.astype(jnp.float32)

        def old_rule(chunk_cnt):
            return np.where(
                chunk_cnt <= 8,
                2 ** np.ceil(np.log2(np.maximum(chunk_cnt, 1))
                             ).astype(np.int64),
                ((chunk_cnt + 7) // 8) * 8).astype(np.int64)

        new_rule = ell._chunk_budgets
        try:
            ell._chunk_budgets = old_rule
            ell._FAST_GRAPH_MEMO.clear()
            fg_old = build_fast_graph(g)
        finally:
            ell._chunk_budgets = new_rule
        E = int(g.num_edges)
        log(f"slot inflation old rule: dst "
            f"{fg_old.dst_plan.num_slots / E:.3f}x src "
            f"{fg_old.src_plan.num_slots / E:.3f}x; new rule: dst "
            f"{fg.dst_plan.num_slots / E:.3f}x src "
            f"{fg.src_plan.num_slots / E:.3f}x")
        for name, fgi in (("old budgets", fg_old), ("new budgets", fg)):
            f = make_ell_sir_aggregate_pallas(
                fgi, jnp.tanh, "sym", edge_dtype=jnp.bfloat16,
                static_scale=True)
            timed_grad(f"pallas sym bf16 {name}",
                       lambda a, b, f=f: f(a, b, e0, valid))

    @section("B: gather-floor decomposition")
    def sec_b():
        idx = fg.dst_slot_srcnode  # [S_dst] the fwd gather indices
        S = int(idx.shape[0])
        log(f"slots: dst={S} src={fg.src_plan.num_slots} "
            f"E={int(g.num_edges)}")

        def take_only(a, b):
            out = jax.lax.optimization_barrier(
                jnp.take(b.astype(jnp.bfloat16), idx, axis=0))
            return out[:1].astype(jnp.float32)  # tiny consumer

        timed_fwd("take-only ekg (bf16, S_dst rows)", take_only)
        valid = g.edge_mask.astype(jnp.float32)
        f = make_ell_sir_aggregate_pallas(
            fg, jnp.tanh, "sym", edge_dtype=jnp.bfloat16,
            static_scale=True)
        timed_fwd("pallas sym bf16 fwd only",
                  lambda a, b: f(a, b, e0, valid))
        timed_grad("pallas sym bf16 fwd+bwd",
                   lambda a, b: f(a, b, e0, valid))
        # floor model: fwd = 1 take + stream; bwd adds 2 takes + stream
        ns_row = 3.9e-9
        log(f"floor model: take ~{S * ns_row * 1e3:.1f} ms; "
            f"3 takes/layer ~{3 * S * ns_row * 1e3:.1f} ms")

    def full_step(graph_fast, windows=3, steps=10):
        from experiments.ogbn_arxiv.model import SIRModel
        from sir_gcn_tpu.train import init_state, make_adamw

        model = SIRModel(hidden_dim=H, output_dim=CLS, num_layers=3,
                         dropout=0.2, norm="bn", residual=True,
                         feat_dropout=0.2, agg_type="sym")
        feats = jnp.asarray(rng.normal(size=(graph_fast.n_pad, 128)),
                            jnp.float32)
        labels = jnp.asarray(rng.integers(0, CLS, graph_fast.n_pad),
                             jnp.int32)
        key = jax.random.PRNGKey(0)
        variables = model.init(key, graph_fast, feats)
        tx = make_adamw(1e-2, 1e-3)
        state = init_state(variables, tx)

        def train_step(state, rng_):
            def loss_fn(params):
                logits, upd = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    graph_fast, feats, deterministic=False,
                    rngs={"dropout": rng_}, mutable=["batch_stats"])
                logp = jax.nn.log_softmax(logits)
                ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
                return jnp.mean(ce), upd.get("batch_stats", {})

            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 batch_stats=bs), loss

        @jax.jit
        def run_steps(state):
            def body(i, carry):
                st, _ = carry
                return train_step(st, jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, steps, body,
                                     (state, jnp.zeros(())))

        st2, loss = run_steps(state)
        float(loss)
        times = []
        for _ in range(windows):
            t0 = time.time()
            _, loss = run_steps(st2)
            float(loss)
            times.append((time.time() - t0) / steps * 1e3)
        log(f"full step: min {min(times):.2f} ms over {windows} windows "
            f"[{', '.join(f'{t:.2f}' for t in times)}]")
        return min(times)

    @section("C: full train step (bench config, random graph)")
    def sec_c():
        dt = full_step(fg)
        E = int(g.num_edges)
        log(f"edge-layers/s: {E * 3 / (dt / 1e3) / 1e6:.1f}M")

    @section("D: power-law graph")
    def sec_d():
        from sir_gcn_tpu.data.synthetic import powerlaw_edges

        rng2 = np.random.default_rng(1)
        ps, pd = powerlaw_edges(rng2, N, E_RAW)
        ps, pd = to_bidirected(ps, pd)
        ps, pd = add_self_loops(ps, pd, N)
        t0 = time.time()
        g2 = build_graph(ps, pd, N, pad_multiple=1024)
        fg2 = build_fast_graph(g2)
        E2 = int(g2.num_edges)
        deg = np.bincount(pd, minlength=N)
        log(f"plans(powerlaw): {time.time() - t0:.1f}s; "
            f"max in-degree {int(deg.max())}; slot inflation "
            f"dst {fg2.dst_plan.num_slots / E2:.3f}x "
            f"src {fg2.src_plan.num_slots / E2:.3f}x; "
            f"dst buckets {fg2.dst_plan.buckets1}")
        log("plan stages: " + ", ".join(
            f"{k}={v:.2f}s"
            for k, v in sorted(plan_timings().items(),
                               key=lambda kv: -kv[1])))
        dt = full_step(fg2)
        log(f"edge-layers/s (powerlaw): {E2 * 3 / (dt / 1e3) / 1e6:.1f}M")

    @section("E: sharded-path @1 re-validation (chained jit)")
    def sec_e():
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sir_gcn_tpu.parallel import make_mesh
        from sir_gcn_tpu.parallel.ell_distributed import (
            build_sharded_fast_graph,
            make_sharded_sir_aggregate,
            make_sharded_sir_aggregate_pallas,
        )

        timed_grad("single-device Pallas fast path",
                   lambda a, b: ell_sir_aggregate(fg, a, b, jnp.tanh,
                                                  "sym",
                                                  static_scale=True))
        sfg = build_sharded_fast_graph(g, 1, agg_type="sym")
        mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
        f_x = make_sharded_sir_aggregate(sfg, jnp.tanh, mesh,
                                         use_pallas=False)
        timed_grad("sharded @1 (XLA local compute)", f_x)
        f_p = make_sharded_sir_aggregate_pallas(sfg, jnp.tanh, mesh)
        timed_grad("sharded @1 (Pallas local compute)", f_p)

    @section("F: halo @1 SIREConv + max (XLA-composed variants)")
    def sec_f():
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sir_gcn_tpu.parallel import make_mesh
        from sir_gcn_tpu.parallel.halo import (
            build_halo_fast_graph,
            make_halo_sir_aggregate,
            make_halo_sir_aggregate_max,
        )

        mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
        e_feat = jnp.asarray(rng.normal(size=(g.e_pad, H)), jnp.float32)
        w_rel = jnp.asarray(rng.normal(size=(H, H)) * 0.1, jnp.float32)
        b_rel = jnp.zeros((H,), jnp.float32)
        valid = g.edge_mask.astype(jnp.float32)

        # single-device references
        f_edge_1 = make_ell_sir_aggregate_pallas(
            fg, jnp.tanh, "sym", with_edge=True,
            edge_dtype=jnp.bfloat16, static_scale=True)
        timed_grad("single-dev SIREConv (pallas, with_edge)",
                   lambda a, b: f_edge_1(a, b, e_feat, valid))
        f_max_1 = make_ell_sir_aggregate_max(fg, jnp.tanh)
        timed_grad("single-dev max agg (XLA slot ops)",
                   lambda a, b: f_max_1(a, b, e0, valid, w_rel, b_rel))

        t0 = time.time()
        hfg = build_halo_fast_graph(g, 1, agg_type="sym")
        log(f"halo fast graph @1: {time.time() - t0:.1f}s")
        f_edge = make_halo_sir_aggregate(hfg, jnp.tanh, mesh,
                                         with_edge=True, feat_width=H)
        timed_grad("halo @1 SIREConv (XLA-composed)",
                   lambda a, b: f_edge(a, b, e_feat))
        hfg_m = build_halo_fast_graph(g, 1, agg_type="max")
        f_max = make_halo_sir_aggregate_max(hfg_m, jnp.tanh, mesh)
        timed_grad("halo @1 max agg (XLA-composed)",
                   lambda a, b: f_max(a, b, e0, valid, w_rel, b_rel))

    sec_a()
    sec_a2()
    sec_b()
    sec_c()
    sec_d()
    sec_e()
    sec_f()


if __name__ == "__main__":
    main()
