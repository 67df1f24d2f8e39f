"""Step-time ablation of the bench config (run alone on the TPU).

Times the full arxiv-scale train step under config variations to locate
the remaining cost after the node-table-major backward rework:
layers 1 vs 3, dropout on/off, fwd-only vs fwd+bwd, H=96 vs 128.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from experiments.ogbn_arxiv.model import SIRModel
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops import set_edge_dtype
    from sir_gcn_tpu.ops.ell import build_fast_graph
    from sir_gcn_tpu.train import init_state, make_adamw

    N, E_RAW, CLS = 169_343, 1_166_243, 40
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E_RAW)
    dst = rng.integers(0, N, E_RAW)
    src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    g = build_graph(src, dst, N, pad_multiple=1024)
    fg = build_fast_graph(g)
    set_edge_dtype(jnp.bfloat16)
    feats = jnp.asarray(rng.normal(size=(g.n_pad, 128)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, CLS, g.n_pad), jnp.int32)
    key = jax.random.PRNGKey(0)

    def timed(name, layers, hidden, dropout, bwd=True, steps=10):
        model = SIRModel(hidden_dim=hidden, output_dim=CLS,
                         num_layers=layers, dropout=dropout, norm="bn",
                         residual=True, feat_dropout=dropout,
                         agg_type="sym")
        variables = model.init(key, fg, feats)
        tx = make_adamw(1e-2, 1e-3)
        state = init_state(variables, tx)

        def loss_fn(params, bs, rng):
            logits, upd = model.apply(
                {"params": params, "batch_stats": bs},
                fg, feats, deterministic=False,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
            return jnp.mean(ce), upd.get("batch_stats", {})

        def step(st, rng):
            if bwd:
                (loss, bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params, st.batch_stats, rng)
                updates, opt_state = tx.update(grads, st.opt_state,
                                               st.params)
                params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                st.params, updates)
                return st.replace(params=params, opt_state=opt_state,
                                  batch_stats=bs), loss
            loss, bs = loss_fn(st.params, st.batch_stats, rng)
            return st.replace(batch_stats=bs), loss

        @jax.jit
        def run(state):
            def body(i, carry):
                st, _ = carry
                return step(st, jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, steps, body,
                                     (state, jnp.zeros(())))

        st2, loss = run(state)
        float(loss[1] if isinstance(loss, tuple) else loss)
        t0 = time.time()
        out = run(st2[0] if isinstance(st2, tuple) else st2)
        float(out[1])
        dt = (time.time() - t0) / steps * 1e3
        log(f"{name:40s} {dt:8.2f} ms/step")
        return dt

    timed("full (3L H96 drop0.2 fwd+bwd)", 3, 96, 0.2)
    timed("fwd-only (3L H96 drop0.2)", 3, 96, 0.2, bwd=False)
    timed("1 layer (H96 drop0.2)", 1, 96, 0.2)
    timed("no dropout (3L H96)", 3, 96, 0.0)
    timed("H=128 (3L drop0.2)", 3, 128, 0.2)


if __name__ == "__main__":
    main()
