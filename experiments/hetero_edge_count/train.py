"""HeteroEdgeCount training harness (reference
``synthetic-datasets/hetero-edge-count/train.py``): graph regression against
an exactly computable statistic; SIR-GCN reaches test MSE ~1e-3 while
GCN/GAT are off by orders of magnitude (README.md:45-64)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sir_gcn_tpu.data import HeteroEdgeCountDataset
from sir_gcn_tpu.data.batching import GraphCollection
from sir_gcn_tpu.train import (
    EpochDriver,
    aggregate_runs,
    init_state,
    make_adamw,
    param_count,
    set_lr_scale,
    set_seed,
)

from experiments.hetero_edge_count.model import (
    GATModel,
    GCNModel,
    GINModel,
    PNAModel,
    SAGEModel,
    SIRModel,
)

MODELS = {"SIR": SIRModel, "GCN": GCNModel, "SAGE": SAGEModel,
          "GAT": GATModel, "GIN": GINModel, "PNA": PNAModel}


def run_single(args, seed: int):
    key = set_seed(seed)
    ds = HeteroEdgeCountDataset(
        args.nodes, args.classes, args.samples, normalize=args.normalize,
        rng=np.random.default_rng(seed),
    )
    coll = GraphCollection(ds.graphs, node_feats=ds.feats,
                           labels=ds.labels)
    n_train = int(args.train_size * len(ds))
    train_idx = np.arange(n_train)
    test_idx = np.arange(n_train, len(ds))

    extra = ({} if args.model == "SIR"
             else {"num_heads": args.nheads,
                   "mlp_layers": args.nlayers_mlp})
    model = MODELS[args.model](
        input_dim=args.classes, hidden_dim=args.nhidden, output_dim=1,
        num_layers=args.nlayers, dropout=args.dropout, **extra,
    )
    first = coll.collate(train_idx[: args.batch_size], args.batch_size)
    key, init_key = jax.random.split(key)
    variables = model.init(init_key, first["graph"],
                           jnp.asarray(first["node_feats"]))
    tx = make_adamw(args.lr, args.wd)
    state = init_state(variables, tx)
    print(f"Params: {param_count(state.params)}")

    def mse(params, graph, feats, labels, weights, det, rng=None):
        kw = {} if det else {"rngs": {"dropout": rng}}
        pred = model.apply({"params": params}, graph, feats,
                           deterministic=det, **kw)[:, 0]
        se = jnp.square(labels - pred)
        return jnp.sum(se * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    @jax.jit
    def train_step(state, key, graph, feats, labels, weights):
        loss, grads = jax.value_and_grad(mse)(
            state.params, graph, feats, labels, weights, False, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        return state.replace(params=params, opt_state=opt_state), loss

    @jax.jit
    def eval_step(state, graph, feats, labels, weights):
        return mse(state.params, graph, feats, labels, weights, True), \
            jnp.sum(weights)

    def evaluate(idx):
        tot_l = tot_w = 0.0
        for b in coll.loader(idx, args.batch_size):
            l, w = eval_step(state, b["graph"],
                             jnp.asarray(b["node_feats"]),
                             jnp.asarray(b["labels"]),
                             jnp.asarray(b["graph_weights"]))
            tot_l += float(l) * float(w)
            tot_w += float(w)
        return tot_l / tot_w

    driver = EpochDriver(epochs=args.epochs, factor=args.factor,
                         patience=args.patience, log_every=args.log_every)
    shuffle_rng = np.random.default_rng(seed + 12345)
    loss = test_loss = float("inf")
    for epoch in range(1, args.epochs + 1):
        # warmup/plateau LR applies to THIS epoch's steps
        state = set_lr_scale(state, driver.lr_scale(epoch))
        for b in coll.loader(train_idx, args.batch_size, shuffle_rng):
            key, sk = jax.random.split(key)
            state, _ = train_step(state, sk, b["graph"],
                                  jnp.asarray(b["node_feats"]),
                                  jnp.asarray(b["labels"]),
                                  jnp.asarray(b["graph_weights"]))
        loss = evaluate(train_idx)
        test_loss = evaluate(test_idx)
        driver.plateau_step(epoch, loss)

        if driver.should_log(epoch):
            print(f"Epoch {epoch:04d} | loss: {loss:.4f} | "
                  f"test_loss: {test_loss:.4f}")
        if loss < 1e-3 and test_loss < 1e-3:
            break

    return loss, test_loss


def main(argv=None):
    p = argparse.ArgumentParser(
        "SIR-GCN/GCN/GAT implementation on HeteroEdgeCount (TPU-native)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--edge-bf16", action="store_true",
                   help="carry the message-passing edge pipeline in "
                        "bfloat16 (f32 accumulation) - the AMP analog for "
                        "the hot path; ~13%% faster, no measured quality "
                        "cost")
    p.add_argument("--gpu", type=int, default=0,
                   help="ignored (device selection is automatic); accepted "
                        "so reference commands run unchanged")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model", type=str, default="SIR", choices=list(MODELS))
    p.add_argument("--nhidden", type=int, default=64)
    p.add_argument("--nlayers", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0)
    p.add_argument("--nheads", type=int, default=1)
    p.add_argument("--nlayers-mlp", type=int, default=1)
    p.add_argument("--nodes", type=int, default=50,
                   help="maximum number of nodes in random graphs")
    p.add_argument("--classes", type=int, default=5)
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--samples", type=int, default=5000)
    p.add_argument("--train-size", type=float, default=0.8)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=0)
    p.add_argument("--factor", type=float, default=0.5)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--nruns", type=int, default=10)
    p.add_argument("--log-every", type=int, default=20)
    args = p.parse_args(argv)
    from sir_gcn_tpu.utils import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: first-in-container compiles only
    if args.edge_bf16:
        from sir_gcn_tpu.ops import set_edge_dtype
        set_edge_dtype(jnp.bfloat16)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    losses, test_losses = [], []
    for i in range(args.nruns):
        l, tl = run_single(args, args.seed + i)
        losses.append(l)
        test_losses.append(tl)
        # per-run progress on stderr so interrupted multi-run protocols
        # keep their completed seeds (stdout stays reference-shaped)
        print(f"[run {i} seed {args.seed + i}] train MSE {l:.8f} "
              f"test MSE {tl:.8f}", file=sys.stderr, flush=True)

    print(args)
    print(f"Runned {args.nruns} times")
    aggregate_runs("train MSE", losses)
    aggregate_runs("test MSE", test_losses)
    return losses, test_losses


if __name__ == "__main__":
    main()
