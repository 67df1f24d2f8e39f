"""Multi-device scaling benchmark: edge-partitioned full-graph SIR training
step over a ``graph`` mesh axis (SURVEY §2c P2; BASELINE.md north-star:
>=80% scaling efficiency at N devices).

On this container only one real TPU chip is reachable, so by default this
runs on virtual CPU devices (plumbing + efficiency *shape* check, not
absolute numbers); on a real pod slice it measures true ICI scaling.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench_scaling.py --devices 1 2 4 8

Prints one JSON line per device count with edges/s and efficiency vs the
single-device run.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument("--nodes", type=int, default=16384)
    p.add_argument("--edges", type=int, default=131072)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--path", type=str, default="halo",
                   choices=["halo", "gspmd"],
                   help="boundary-only halo fast path (Pallas local "
                        "compute on TPU) or GSPMD-partitioned CSR")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from experiments.ogbn_arxiv.model import SIRModel
    from sir_gcn_tpu import build_graph
    from sir_gcn_tpu.parallel import make_mesh, shard_full_graph
    from sir_gcn_tpu.parallel.full_graph import node_sharding, replicated
    from sir_gcn_tpu.train import init_state, make_adamw

    counts = args.devices or [1, jax.device_count()]
    rng = np.random.default_rng(0)
    N, E = args.nodes, args.edges
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    feats_np = rng.normal(size=(N, 128)).astype(np.float32)
    labels_np = rng.integers(0, 40, N).astype(np.int32)

    model = SIRModel(hidden_dim=args.hidden, output_dim=40,
                     num_layers=args.layers, agg_type="sym",
                     residual=True, norm="ln")
    tx = make_adamw(1e-2)
    base = None

    for nd in counts:
        devices = jax.devices()[:nd]
        # pad so n_pad divides nd
        mult = 128 * nd
        graph = build_graph(src, dst, N, pad_multiple=mult)
        n_pad = graph.n_pad
        feats = np.zeros((n_pad, 128), np.float32)
        feats[:N] = feats_np
        labels = np.zeros(n_pad, np.int32)
        labels[:N] = labels_np

        mesh = make_mesh((nd,), ("graph",), devices=devices)
        if args.path == "halo":
            from sir_gcn_tpu.parallel.halo import build_halo_graph

            gs = build_halo_graph(graph, nd, mesh, agg_type="sym")
        else:
            gs = shard_full_graph(graph, mesh)
        feats_s = jax.device_put(jnp.asarray(feats), node_sharding(mesh))
        labels_s = jax.device_put(jnp.asarray(labels), node_sharding(mesh))
        variables = jax.device_put(
            model.init(jax.random.PRNGKey(0), gs, feats_s),
            replicated(mesh))
        state = init_state(variables, tx)

        def train_step(state, rng, feats, labels):
            def lf(params):
                logits = model.apply(
                    {"params": params,
                     "batch_stats": state.batch_stats},
                    gs, feats, deterministic=True)
                logp = jax.nn.log_softmax(logits)
                return -jnp.mean(jnp.take_along_axis(
                    logp, labels[:, None], 1))

            loss, grads = jax.value_and_grad(lf)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
            return state.replace(params=params,
                                 opt_state=opt_state), loss

        steps = args.steps
        key = jax.random.PRNGKey(0)

        @jax.jit
        def run_steps(state):
            def body(i, carry):
                st, _ = carry
                return train_step(st, key, feats_s, labels_s)
            return jax.lax.fori_loop(0, steps, body,
                                     (state, jnp.zeros(())))

        st2, loss = run_steps(state)
        float(loss)
        t0 = time.time()
        _, loss = run_steps(st2)
        float(loss)
        dt = (time.time() - t0) / steps
        eps = E * args.layers / dt
        if base is None:
            base = eps
        eff = eps / (base * nd)
        print(json.dumps({
            "metric": "scaling_edge_layers_per_s",
            "devices": nd,
            "value": round(eps, 1),
            "unit": "edge-layers/s",
            "efficiency_vs_1dev": round(eff, 4),
        }))


if __name__ == "__main__":
    main()
