"""Extended step-time ablation (run alone on the TPU).

Round-1 numbers left a puzzle: the aggregate-only microbench
(tools/bench_dist1.py) runs 12.2 ms/layer fwd+bwd, but the full model pays
~31 ms/layer (ROADMAP ablation).  This script brackets the missing
~19 ms/layer: an aggregate+GEMM chain outside the model, then the model
with norm/residual/dropout/agg toggled one at a time.
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
    from experiments.ogbn_arxiv.model import SIRModel, leaky_relu02
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops import message_passing as mp
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

    def run_timed(name, step_fn, state0, steps=10):
        @jax.jit
        def run(st):
            def body(i, carry):
                st, _ = carry
                return step_fn(st, jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, steps, body,
                                     (st, jnp.zeros(())))

        log(f"[compile] {name} ...")
        t_c = time.time()
        out = run(state0)
        float(out[1])
        log(f"[compile] done in {time.time() - t_c:.0f}s")
        t0 = time.time()
        out2 = run(out[0])
        float(out2[1])
        dt = (time.time() - t0) / steps * 1e3
        log(f"{name:44s} {dt:8.2f} ms/step")
        return dt

    # ---- aggregate + GEMM chain, outside the model -------------------
    def aggchain(name, layers=3, hidden=96, dropout=0.0):
        kk = jax.random.split(key, 3 * layers + 1)
        x0 = feats @ jnp.asarray(
            rng.normal(size=(128, hidden)) * 0.1, jnp.float32)
        params = tuple(
            (jnp.asarray(rng.normal(size=(hidden, hidden)) * 0.1,
                         jnp.float32),
             jnp.asarray(rng.normal(size=(hidden, hidden)) * 0.1,
                         jnp.float32),
             jnp.asarray(rng.normal(size=(hidden, hidden)) * 0.1,
                         jnp.float32))
            for _ in range(layers))

        def step(params, rkey):
            def loss_fn(params):
                x = x0
                for i, (wq, wk, wr) in enumerate(params):
                    eq = x @ wq
                    ek = x @ wk
                    if dropout > 0:
                        k1 = jax.random.fold_in(rkey, 2 * i)
                        k2 = jax.random.fold_in(rkey, 2 * i + 1)
                        eq = eq * jax.random.bernoulli(
                            k1, 1 - dropout, eq.shape) / (1 - dropout)
                        ek = ek * jax.random.bernoulli(
                            k2, 1 - dropout, ek.shape) / (1 - dropout)
                    a = mp.sir_aggregate(fg, eq, ek, leaky_relu02, "sym")
                    x = a @ wr + x
                return jnp.mean(x * x)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params = jax.tree_util.tree_map(
                lambda p, g_: p - 1e-6 * g_, params, grads)
            return params, loss

        return run_timed(name, step, params)

    # ---- model rows --------------------------------------------------
    def model_row(name, bwd=True, steps=10, **kw):
        cfg = dict(hidden_dim=96, output_dim=CLS, num_layers=3,
                   dropout=0.2, norm="bn", residual=True,
                   feat_dropout=0.2, agg_type="sym")
        cfg.update(kw)
        model = SIRModel(**cfg)
        variables = model.init(key, fg, feats)
        tx = make_adamw(1e-2, 1e-3)
        state = init_state(variables, tx)

        def loss_fn(params, bs, rkey):
            logits, upd = model.apply(
                {"params": params, "batch_stats": bs},
                fg, feats, deterministic=False,
                rngs={"dropout": rkey}, mutable=["batch_stats"])
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
            return jnp.mean(ce), upd.get("batch_stats", {})

        def step(st, rkey):
            if bwd:
                (loss, bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params, st.batch_stats,
                                           rkey)
                updates, opt_state = tx.update(grads, st.opt_state,
                                               st.params)
                params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                st.params, updates)
                return st.replace(params=params, opt_state=opt_state,
                                  batch_stats=bs), loss
            loss, bs = loss_fn(st.params, st.batch_stats, rkey)
            return st.replace(batch_stats=bs), loss

        return run_timed(name, step, state, steps)

    rows = {
        "agg": lambda: aggchain("aggchain 3L H96 (agg+3GEMM+resid)"),
        "aggdrop": lambda: aggchain("aggchain 3L H96 + eq/ek dropout",
                                    dropout=0.2),
        "full": lambda: model_row("model full (3L H96 bn resid drop)"),
        "nonorm": lambda: model_row("model norm=none", norm="none"),
        "noresid": lambda: model_row("model residual=False",
                                     residual=False),
        "nofdrop": lambda: model_row("model feat_dropout=0", feat_dropout=0.0),
        "layers0": lambda: model_row("model 0 layers", num_layers=0),
        "fwd": lambda: model_row("model fwd-only", bwd=False),
    }
    sel = sys.argv[1:] or list(rows)
    log(f"graph ready; running rows: {sel}")
    for name in sel:
        rows[name]()


if __name__ == "__main__":
    main()
