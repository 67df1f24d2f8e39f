"""Round-4 consolidated TPU measurements (run ALONE on the TPU; one
process amortizes the 10-18 min chip re-init a fresh process can pay).

Sections, each failure-isolated:

  A. cold-start plan build, FIRST in process (after the round-4 batched
     uploads) — the <=5 s target from VERDICT r3 item 6
  B. distributed per-chip gap decomposition @1 shard (VERDICT item 1):
     single-device Pallas baseline vs sharded/halo Pallas with literal
     vs elided unit collectives — attributes the r3 13.6% tax to
     collective-at-1 artifacts vs genuine local overhead
  C. full train step (bench config), 3 windows, random + power-law
  D. layer-independent remainder ablation (VERDICT item 8): full step
     minus dropout / minus BN / SGD-instead-of-AdamW / fwd-only
  E. (--n50) DictionaryLookup n=50 at the reference 10-run protocol
     (VERDICT item 2) — runs last, hours-scale

Usage:  setsid nohup python tools/r4bench.py --n50 > r4bench.log 2>&1 &
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--n50", action="store_true",
                    help="run the DictionaryLookup n=50 10-run protocol "
                         "at the end (hours)")
    ap.add_argument("--skip-abcd", action="store_true")
    ap.add_argument("--sections", type=str, default="BCD",
                    help="which of B/C/D to run (A always runs)")
    cli = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops import set_edge_dtype
    from sir_gcn_tpu.ops.ell import (
        build_fast_graph,
        ell_sir_aggregate,
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

    state = {}

    @section("A: cold-start plan build (batched uploads)")
    def sec_a():
        t0 = time.time()
        g = build_graph(src, dst, N, pad_multiple=1024)
        t_g = time.time() - t0
        t0 = time.time()
        fg = build_fast_graph(g)
        t_plan = time.time() - t0
        log(f"build_graph {t_g:.1f}s; build_fast_graph {t_plan:.1f}s "
            f"(first in process; r3: 9.7s cold / 6.0s steady)")
        log("stages: " + ", ".join(
            f"{k}={v:.2f}s" for k, v in sorted(plan_timings().items(),
                                               key=lambda kv: -kv[1])))
        # steady-state rebuild (memo cleared) for the non-first cost
        import sir_gcn_tpu.ops.ell as ell

        ell._FAST_GRAPH_MEMO.clear()
        t0 = time.time()
        fg = build_fast_graph(g)
        log(f"steady-state rebuild: {time.time() - t0:.1f}s; stages: "
            + ", ".join(f"{k}={v:.2f}s"
                        for k, v in sorted(plan_timings().items(),
                                           key=lambda kv: -kv[1])))
        state["g"], state["fg"] = g, fg

    sec_a()
    if "g" not in state:
        log("graph build failed; abort")
        return
    g, fg = state["g"], state["fg"]
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
        log(f"{name:52s} {dt:8.2f} ms/iter (fwd+bwd)")
        return dt

    @section("B: distributed per-chip gap decomposition @1 shard")
    def sec_b():
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sir_gcn_tpu.parallel import make_mesh
        from sir_gcn_tpu.parallel.ell_distributed import (
            build_sharded_fast_graph,
            make_sharded_sir_aggregate_pallas,
        )
        from sir_gcn_tpu.parallel.halo import (
            build_halo_fast_graph,
            make_halo_sir_aggregate_pallas,
        )

        t_single = timed_grad(
            "single-device Pallas fast path",
            lambda a, b: ell_sir_aggregate(fg, a, b, jnp.tanh, "sym",
                                           static_scale=True))
        t0 = time.time()
        sfg = build_sharded_fast_graph(g, 1, agg_type="sym")
        log(f"sharded fast graph @1: {time.time() - t0:.1f}s")
        mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
        for elide in (False, True):
            f_p = make_sharded_sir_aggregate_pallas(
                sfg, jnp.tanh, mesh, elide_unit_collectives=elide)
            t = timed_grad(
                f"sharded @1 Pallas (bf16 collectives, elide={elide})",
                f_p)
            log(f"  -> per-chip efficiency vs single-device: "
                f"{t_single / t * 100:.1f}%")
        # shard_map-free twin of the sharded local program (same plans,
        # same kernels, no manual-sharding region): isolates the
        # shard_map boundary cost from the plan/kernel cost
        from sir_gcn_tpu.ops.ell import _bucket_offsets
        from sir_gcn_tpu.ops.pallas import (
            bucket_bcast_act_reduce2,
            bucket_src_bwd,
        )
        from sir_gcn_tpu.parallel.ell_distributed import _unstack_plan

        dplan = _unstack_plan(sfg.dst_plan)
        splan = _unstack_plan(sfg.src_plan)
        offs_d = _bucket_offsets(dplan.buckets1)
        offs_s = _bucket_offsets(splan.buckets1)
        cast = lambda x: x.astype(jnp.bfloat16)
        cat = lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0]
        ssn, ssc = sfg.slot_srcnode[0], sfg.slot_scale[0]
        sdn, sds = sfg.src_slot_dstnode[0], sfg.src_slot_scale[0]

        @jax.custom_vjp
        def f_ns(eq, ek):
            ekg = jnp.take(cast(ek), ssn, axis=0)
            eq_rows = jnp.take(eq, dplan.row_key, axis=0)
            rows = []
            for b, nr, so, ro in offs_d:
                r, _ = bucket_bcast_act_reduce2(
                    ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                    ssc[so:so + b * nr].reshape(nr, b), b, jnp.tanh)
                rows.append(r)
            return dplan.finalize_rows_sum(cat(rows))

        def f_ns_fwd(eq, ek):
            ekg = jnp.take(cast(ek), ssn, axis=0)
            eq_rows = jnp.take(eq, dplan.row_key, axis=0)
            rows, srows = [], []
            for b, nr, so, ro in offs_d:
                r, sr = bucket_bcast_act_reduce2(
                    ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                    ssc[so:so + b * nr].reshape(nr, b), b, jnp.tanh)
                rows.append(r)
                srows.append(sr)
            return (dplan.finalize_rows_sum(cat(rows)),
                    (eq, ek, dplan.finalize_rows_sum(cat(srows))))

        def f_ns_bwd(res, gr):
            eq, ek, sbar = res
            eqg = jnp.take(cast(eq), sdn, axis=0)
            gg = jnp.take(cast(gr), sdn, axis=0)
            ek_rows = jnp.take(cast(ek), splan.row_key, axis=0)
            rows = []
            for b, nr, so, ro in offs_s:
                r, _ = bucket_src_bwd(
                    eqg[so:so + b * nr], ek_rows[ro:ro + nr],
                    sds[so:so + b * nr].reshape(nr, b),
                    gg[so:so + b * nr], b, jnp.tanh)
                rows.append(r)
            return gr * sbar, splan.finalize_rows_sum(cat(rows))

        f_ns.defvjp(f_ns_fwd, f_ns_bwd)
        timed_grad("sharded plans, NO shard_map (same kernels)", f_ns)

        # hybrid: the SAME twin program but fed the single-device
        # FastGraph's plan arrays — if this hits single-device speed the
        # residual is in the harmonized plan DATA (layout/ordering); if
        # not, it is in the twin program shape itself
        def make_twin(dplan_, splan_, ssn_, ssc_, sdn_, sds_):
            offs_d_ = _bucket_offsets(dplan_.buckets1)
            offs_s_ = _bucket_offsets(splan_.buckets1)

            @jax.custom_vjp
            def tw(eq, ek):
                return tw_fwd(eq, ek)[0]

            def tw_fwd(eq, ek):
                ekg = jnp.take(cast(ek), ssn_, axis=0)
                eq_rows = jnp.take(eq, dplan_.row_key, axis=0)
                rows, srows = [], []
                for b, nr, so, ro in offs_d_:
                    r, sr = bucket_bcast_act_reduce2(
                        ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                        ssc_[so:so + b * nr].reshape(nr, b), b, jnp.tanh)
                    rows.append(r)
                    srows.append(sr)
                return (dplan_.finalize_rows_sum(cat(rows)),
                        (eq, ek, dplan_.finalize_rows_sum(cat(srows))))

            def tw_bwd(res, gr):
                eq, ek, sbar = res
                eqg = jnp.take(cast(eq), sdn_, axis=0)
                gg = jnp.take(cast(gr), sdn_, axis=0)
                ek_rows = jnp.take(cast(ek), splan_.row_key, axis=0)
                rows = []
                for b, nr, so, ro in offs_s_:
                    r, _ = bucket_src_bwd(
                        eqg[so:so + b * nr], ek_rows[ro:ro + nr],
                        sds_[so:so + b * nr].reshape(nr, b),
                        gg[so:so + b * nr], b, jnp.tanh)
                    rows.append(r)
                return gr * sbar, splan_.finalize_rows_sum(cat(rows))

            tw.defvjp(tw_fwd, tw_bwd)
            return tw

        tw_fg = make_twin(fg.dst_plan, fg.src_plan,
                          fg.dst_slot_srcnode,
                          fg.dst_slot_scales["sym"],
                          fg.src_slot_dstnode,
                          fg.src_slot_scales["sym"])
        timed_grad("twin program, SINGLE-DEVICE plan arrays", tw_fg)

        # exact structural replica of the single-device path: OUTER
        # pad-to-128 wrapper + f32 ek row table, sharded-builder data
        def make_twin2(dplan_, splan_, ssn_, ssc_, sdn_, sds_):
            offs_d_ = _bucket_offsets(dplan_.buckets1)
            offs_s_ = _bucket_offsets(splan_.buckets1)

            @jax.custom_vjp
            def tw(eq, ek):
                return tw_fwd(eq, ek)[0]

            def tw_fwd(eq, ek):
                ekg = jnp.take(cast(ek), ssn_, axis=0)
                eq_rows = jnp.take(eq, dplan_.row_key, axis=0)
                rows, srows = [], []
                for b, nr, so, ro in offs_d_:
                    r, sr = bucket_bcast_act_reduce2(
                        ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                        ssc_[so:so + b * nr].reshape(nr, b), b, jnp.tanh)
                    rows.append(r)
                    srows.append(sr)
                return (dplan_.finalize_rows_sum(cat(rows)),
                        (eq, ek, dplan_.finalize_rows_sum(cat(srows))))

            def tw_bwd(res, gr):
                eq, ek, sbar = res
                eqg = jnp.take(cast(eq), sdn_, axis=0)
                gg = jnp.take(cast(gr), sdn_, axis=0)
                ek_rows = jnp.take(ek, splan_.row_key, axis=0)  # f32
                rows = []
                for b, nr, so, ro in offs_s_:
                    r, _ = bucket_src_bwd(
                        eqg[so:so + b * nr], ek_rows[ro:ro + nr],
                        sds_[so:so + b * nr].reshape(nr, b),
                        gg[so:so + b * nr], b, jnp.tanh)
                    rows.append(r)
                return gr * sbar, splan_.finalize_rows_sum(cat(rows))

            tw.defvjp(tw_fwd, tw_bwd)

            def padded_tw(eq, ek):
                pad = lambda x: jnp.pad(x, ((0, 0), (0, 128 - 96)))
                return tw(pad(eq), pad(ek))[:, :96]

            return padded_tw

        tw2 = make_twin2(_unstack_plan(sfg.dst_plan),
                         _unstack_plan(sfg.src_plan),
                         ssn, ssc, sdn, sds)
        timed_grad("twin EXACT single-structure (outer pad)", tw2)

        t0 = time.time()
        hfg = build_halo_fast_graph(g, 1, agg_type="sym")
        log(f"halo fast graph @1: {time.time() - t0:.1f}s; stages: "
            + ", ".join(f"{k}={v:.2f}s"
                        for k, v in sorted(plan_timings().items(),
                                           key=lambda kv: -kv[1])))
        for elide in (False, True):
            f_h = make_halo_sir_aggregate_pallas(
                hfg, jnp.tanh, mesh, elide_unit_collectives=elide)
            t = timed_grad(
                f"halo @1 Pallas (bf16 exchange, elide={elide})", f_h)
            log(f"  -> per-chip efficiency vs single-device: "
                f"{t_single / t * 100:.1f}%")

    def full_step(graph_fast, model_kw=None, tx_=None, windows=3,
                  steps=10, fwd_only=False):
        from experiments.ogbn_arxiv.model import SIRModel
        from sir_gcn_tpu.train import init_state, make_adamw

        kw = dict(hidden_dim=H, output_dim=CLS, num_layers=3,
                  dropout=0.2, norm="bn", residual=True,
                  feat_dropout=0.2, agg_type="sym")
        kw.update(model_kw or {})
        model = SIRModel(**kw)
        feats = jnp.asarray(rng.normal(size=(graph_fast.n_pad, 128)),
                            jnp.float32)
        labels = jnp.asarray(rng.integers(0, CLS, graph_fast.n_pad),
                             jnp.int32)
        key = jax.random.PRNGKey(0)
        variables = model.init(key, graph_fast, feats)
        tx = tx_ or make_adamw(1e-2, 1e-3)
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

            if fwd_only:
                loss, bs = loss_fn(state.params)
                return state, loss
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
        return min(times), times

    @section("C: full train step (bench config)")
    def sec_c():
        dt, times = full_step(fg)
        E = int(g.num_edges)
        log(f"full step (random graph): min {dt:.2f} ms "
            f"[{', '.join(f'{t:.2f}' for t in times)}] -> "
            f"{E * 3 / (dt / 1e3) / 1e6:.1f}M edge-layers/s "
            f"(r3: 101.49 ms)")
        from sir_gcn_tpu.data.synthetic import powerlaw_edges

        rng2 = np.random.default_rng(1)
        ps, pd = powerlaw_edges(rng2, N, E_RAW)
        ps, pd = to_bidirected(ps, pd)
        ps, pd = add_self_loops(ps, pd, N)
        t0 = time.time()
        g2 = build_graph(ps, pd, N, pad_multiple=1024)
        fg2 = build_fast_graph(g2)
        log(f"powerlaw plans: {time.time() - t0:.1f}s")
        dt2, times2 = full_step(fg2)
        E2 = int(g2.num_edges)
        log(f"full step (powerlaw): min {dt2:.2f} ms "
            f"[{', '.join(f'{t:.2f}' for t in times2)}] -> "
            f"{E2 * 3 / (dt2 / 1e3) / 1e6:.1f}M edge-layers/s "
            f"(r3: 104.63 ms)")

    @section("D: layer-independent remainder ablation")
    def sec_d():
        import optax

        base, _ = full_step(fg)
        log(f"baseline full step          {base:8.2f} ms")
        d, _ = full_step(fg, model_kw=dict(dropout=0.0, feat_dropout=0.0))
        log(f"- dropout                   {d:8.2f} ms  (delta "
            f"{base - d:+.2f})")
        n, _ = full_step(fg, model_kw=dict(norm="none"))
        log(f"- BatchNorm                 {n:8.2f} ms  (delta "
            f"{base - n:+.2f})")
        s, _ = full_step(fg, tx_=optax.sgd(1e-2))
        log(f"SGD instead of AdamW        {s:8.2f} ms  (delta "
            f"{base - s:+.2f})")
        f, _ = full_step(fg, fwd_only=True)
        log(f"fwd-only (no grad/opt)      {f:8.2f} ms")

    if not cli.skip_abcd:
        if "B" in cli.sections:
            sec_b()
        if "C" in cli.sections:
            sec_c()
        if "D" in cli.sections:
            sec_d()

    if cli.n50:
        log("==== E: DictionaryLookup n=50, 10-run protocol (TPU) ====")
        # protocol cleanliness: the sections above set the bf16 edge
        # pipeline and hardware RNG; the reference protocol runs with
        # framework defaults (f32 edges, threefry)
        set_edge_dtype(None)
        jax.config.update("jax_default_prng_impl", "threefry2x32")
        t0 = time.time()
        from experiments.dictionary_lookup.train import main as dl_main

        dl_main(["--nlayers", "1", "--epochs", "500", "--batch-size",
                 "256", "--lr", "1e-3", "--factor", "0.5", "--patience",
                 "10", "--model", "SIR", "--nhidden", "200", "--nodes",
                 "50", "--nruns", "10"])
        log(f"==== E done in {time.time() - t0:.0f}s ====")


if __name__ == "__main__":
    main()
