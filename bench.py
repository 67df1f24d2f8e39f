"""Benchmark: edges/s/chip on the flagship ogbn-arxiv-shaped workload.

Runs the full training step (forward + backward + AdamW) of the reference's
winning ogbn-arxiv SIR-GCN configuration (hidden 95->96, 3 layers, sym
aggregation, BatchNorm, residual — ``benchmark-datasets/ogbn-arxiv/
train.py:303``) on an arxiv-sized graph (169,343 nodes; ~2.48M directed
edges after bidirection + self-loops, matching train.py:42-55 transforms),
and reports sustained edge-layer traversals per second.

vs_baseline is the fraction of an HBM-roofline estimate: the hot path moves
~(2 fwd + 4 bwd) * hidden * 4 bytes per edge per layer; at v5e's ~819 GB/s
that bounds edge-layers/s. The reference publishes no throughput numbers
(SURVEY §6), so the roofline is the bar.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def community_graph(rng, n, e, comm=85, p_intra=0.8):
    """Citation-network-like topology: most edges inside ~comm-node
    communities (real arxiv has strong locality; the default random graph
    is the worst case for gather locality)."""
    dst = rng.integers(0, n, e)
    intra = rng.random(e) < p_intra
    base = (dst // comm) * comm
    src = np.where(intra,
                   np.minimum(base + rng.integers(0, comm, e), n - 1),
                   rng.integers(0, n, e))
    return src, dst


def main(args):
    import jax

    from sir_gcn_tpu.utils import enable_compile_cache

    # persistent XLA cache (measured on axon: a warm-cache process loads
    # executables in ~0.1 s where cold compiles cost 1-100 s); disable
    # with SIR_GCN_NO_COMPILE_CACHE=1 when measuring true cold compiles
    enable_compile_cache()
    # hardware RNG for dropout masks (~5 ms/step cheaper than threefry at
    # this scale; the framework default stays threefry for bit-exact
    # cross-platform reproducibility)
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from experiments.ogbn_arxiv.model import SIRModel
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.train import init_state, make_adamw

    N = 169_343
    E_RAW = 1_166_243
    HIDDEN, LAYERS = 96, 3
    NUM_CLASSES = 40
    FEAT_DIM = 128

    rng = np.random.default_rng(0)
    log(f"building arxiv-sized graph: {N} nodes, {E_RAW} raw edges "
        f"({args.graph}) ...")
    if args.graph == "community":
        src, dst = community_graph(rng, N, E_RAW)
    elif args.graph == "powerlaw":
        from sir_gcn_tpu.data.synthetic import powerlaw_edges

        src, dst = powerlaw_edges(rng, N, E_RAW)
    else:
        src = rng.integers(0, N, E_RAW)
        dst = rng.integers(0, N, E_RAW)
    src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    if args.reorder:
        from sir_gcn_tpu import bandwidth, permute_nodes, rcm_order

        t0 = time.time()
        perm = rcm_order(src, dst, N)
        b0 = bandwidth(src, dst)
        src, dst, _ = permute_nodes(src, dst, perm)
        log(f"RCM reorder: {time.time() - t0:.1f}s, mean |src-dst| "
            f"{b0:.0f} -> {bandwidth(src, dst):.0f}")
    graph = build_graph(src, dst, N, pad_multiple=1024)
    E = int(graph.num_edges)
    log(f"padded: n_pad={graph.n_pad} e_pad={graph.e_pad} edges={E}")
    log("building ELL fast-graph plans ...")
    from sir_gcn_tpu.ops import set_edge_dtype
    from sir_gcn_tpu.ops.ell import (
        build_fast_graph,
        last_build_memo_hit,
        plan_timings,
    )
    t_plan = time.time()
    graph = build_fast_graph(graph)
    plan_seconds = time.time() - t_plan
    deg = np.bincount(np.asarray(dst), minlength=N)
    log(f"plans: {plan_seconds:.1f}s; slot inflation "
        f"dst {graph.dst_plan.num_slots / max(E, 1):.3f}x "
        f"src {graph.src_plan.num_slots / max(E, 1):.3f}x; "
        f"max in-degree {int(deg.max())}; "
        f"dst buckets {graph.dst_plan.buckets1}")
    log("plan stage timings: " + ", ".join(
        f"{k}={v:.2f}s" for k, v in sorted(plan_timings().items(),
                                           key=lambda kv: -kv[1]))
        + (" (memo hit)" if last_build_memo_hit() else ""))
    # bf16 edge pipeline (f32 accumulation) — the framework's AMP analog
    set_edge_dtype(jnp.bfloat16)
    if args.remat:
        from sir_gcn_tpu.ops import set_remat

        set_remat(True)

    efeats = None
    if args.edge_features:
        # SIREConv lane (VERDICT r4 item 8): the same 3-layer step with
        # the fused-edge path (basis De=16, projection folded into the
        # kernels). Conv-internal dropout is 0 so the fused route
        # engages (edge-term dropout would need the generic path — the
        # reference shares one rate across eq/ek/e); the between-layer
        # dropout/BN/residual stay as in the main lane.
        import flax.linen as nn

        from sir_gcn_tpu.models import Linear as SLinear
        from sir_gcn_tpu.models import SIREConv, get_norm
        from experiments.ogbn_arxiv.model import leaky_relu02

        DE = 16

        class SIREBenchModel(nn.Module):
            @nn.compact
            def __call__(self, graph, feats, efeats, *,
                         deterministic=True):
                drop = nn.Dropout(0.2, deterministic=deterministic)
                x = SLinear(HIDDEN, name="embedding")(feats)
                for i in range(LAYERS):
                    resid = x
                    x = SIREConv(HIDDEN, HIDDEN, leaky_relu02,
                                 dropout=0.0, agg_type="sym",
                                 name=f"conv_{i}")(
                        graph, x, efeats, deterministic=deterministic)
                    x = get_norm("bn", True, HIDDEN)(
                        graph, x, deterministic=deterministic)
                    x = drop(leaky_relu02(x)) + resid
                return SLinear(NUM_CLASSES, name="readout")(x)

        model = SIREBenchModel()
        efeats = jnp.asarray(rng.normal(size=(graph.e_pad, DE)),
                             jnp.float32)
    else:
        model = SIRModel(hidden_dim=HIDDEN, output_dim=NUM_CLASSES,
                         num_layers=LAYERS, dropout=0.2, norm="bn",
                         residual=True, feat_dropout=0.2, agg_type="sym")
    feats = jnp.asarray(rng.normal(size=(graph.n_pad, FEAT_DIM)),
                        jnp.float32)
    labels = jnp.asarray(rng.integers(0, NUM_CLASSES, graph.n_pad),
                         jnp.int32)

    key = jax.random.PRNGKey(0)
    margs = (graph, feats) if efeats is None else (graph, feats, efeats)
    variables = model.init(key, *margs)
    tx = make_adamw(1e-2, 1e-3)
    state = init_state(variables, tx)

    def train_step(state, rng, feats, labels, efeats):
        def loss_fn(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *((graph, feats) if efeats is None
                  else (graph, feats, efeats)), deterministic=False,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
            return jnp.mean(ce), upd.get("batch_stats", {})

        (loss, bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=bs), loss

    steps = 10

    # chain steps inside one executable: the tunneled runtime makes
    # per-dispatch timing unreliable, and a final device->host fetch is the
    # only reliable completion barrier. feats/labels/efeats are EXPLICIT
    # arguments: closure constants are serialized into the relay's
    # remote-compile request, and the edge lane's 160 MB efeats pushed it
    # over the endpoint's body limit (HTTP 413 — round 5)
    @jax.jit
    def run_steps_args(state, feats, labels, *e):
        def body(i, carry):
            st, _ = carry
            st, loss = train_step(st, jax.random.fold_in(key, i),
                                  feats, labels, e[0] if e else None)
            return (st, loss)
        st, loss = jax.lax.fori_loop(0, steps, body,
                                     (state, jnp.zeros(())))
        return st, loss

    def run_steps(state):
        if efeats is None:
            return run_steps_args(state, feats, labels)
        return run_steps_args(state, feats, labels, efeats)

    log(f"compiling on {jax.devices()[0]} ...")
    t0 = time.time()
    state2, loss = run_steps(state)
    loss_val = float(loss)
    log(f"compile+{steps} steps: {time.time() - t0:.1f}s "
        f"loss={loss_val:.3f}")

    # variance protocol (VERDICT r2): >=3 chained-jit windows; report the
    # min (the contended tunnel only ever adds time) plus the spread so
    # few-% deltas across rounds are attributable to code vs noise
    times = []
    for w in range(args.windows):
        t0 = time.time()
        _, loss = run_steps(state2)
        float(loss)
        times.append((time.time() - t0) / steps)
    dt = min(times)
    log(f"step time: min {dt * 1e3:.2f} ms over {len(times)} windows "
        f"[{', '.join(f'{t * 1e3:.2f}' for t in times)}] "
        f"spread {(max(times) / dt - 1) * 100:.1f}%")

    edge_layers_per_s = E * LAYERS / dt

    # Honest speed-of-light for the scatter-free design (ROADMAP round-3
    # take cost model): the step is RANDOM-TAKE-bound — 3 gather passes
    # per layer at the measured ~3.9 ns/row — not HBM-stream-bound. The
    # forward take runs over the dst plan's slots; the two backward takes
    # (eq[dst_e], g[dst_e]) over the src plan's. The JSON keeps the
    # HBM-roofline fraction for cross-round comparability and ALSO
    # carries the floor fraction / plan time so the artifact self-grades
    # against the measured speed-of-light, not only the unreachable
    # stream roofline (VERDICT r3 item 5).
    d_slots = int(graph.dst_plan.num_slots)
    s_slots = int(graph.src_plan.num_slots)
    if args.edge_features:
        # fused-edge take model: the basis gathers add one dst-slot take
        # (fwd) and one src-slot take (bwd) per layer. Unlike the
        # >=192 B node-table rows (3.9 ns/row), the 64 B basis rows
        # measure ~2.0 ns/row (implied by the first lane run: 132.1 ms
        # vs the linear lane's 101.9 => ~10 ms/layer for 2 x 2.66M
        # basis rows — narrower rows DO get cheaper below the 192 B
        # class, refining the round-3 row-bound model)
        floor = LAYERS * ((d_slots + 2 * s_slots) * 3.9e-9
                          + (d_slots + s_slots) * 2.0e-9) + 8e-3
    else:
        floor = LAYERS * (d_slots + 2 * s_slots) * 3.9e-9 + 8e-3
    floor_fraction = floor / dt
    log(f"measured-floor fraction: {floor_fraction:.2f} "
        f"((1 x {d_slots} dst + 2 x {s_slots} src slots)/layer "
        f"x 3.9 ns + ~8 ms fixed"
        + (", + basis takes" if args.edge_features else "") + ")")

    # HBM roofline estimate (see module docstring)
    bytes_per_edge_layer = (2 + 4) * HIDDEN * 4
    hbm_bw = 819e9  # v5e
    roofline = hbm_bw / bytes_per_edge_layer

    record = {
        "metric": ("arxiv_sire_fused_edge_layers_per_s"
                   if args.edge_features
                   else "arxiv_sir_fwd_bwd_edge_layers_per_s"),
        "value": round(edge_layers_per_s, 1),
        "unit": "edge-layers/s/chip",
        "vs_baseline": round(edge_layers_per_s / roofline, 4),
        "step_ms": round(dt * 1e3, 2),
        "floor_fraction": round(floor_fraction, 4),
        "plan_seconds": round(plan_seconds, 2),
    }
    if args.graph == "powerlaw":
        record["powerlaw_step_ms"] = record["step_ms"]
    print(json.dumps(record))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--graph", choices=["random", "community", "powerlaw"],
                   default="random")
    p.add_argument("--reorder", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--edge-features", action="store_true",
                   help="SIREConv lane: fused-edge path (basis De=16), "
                        "same JSON schema, own floor model")
    p.add_argument("--windows", type=int, default=3,
                   help="timed 10-step windows; min is reported")
    cli = p.parse_args()
    # The tunneled TPU can be transiently wedged by a previous process
    # (FAILED_PRECONDITION); retry a few times before giving up.
    for attempt in range(3):
        try:
            main(cli)
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            log(f"attempt {attempt + 1} failed ({type(e).__name__}: "
                f"{e}); retrying in 60s ...")
            time.sleep(60)
