"""SBM PATTERN/CLUSTER harness (reference
``benchmark-datasets/sbm-dataset/train.py``): inductive node classification
on batched SBM graphs, class-weighted CE with weights recomputed per batch
(train.py:52-56), class-balanced accuracy (train.py:58-61). Model:
embedding encoder + SIRConv stack + JK node readouts (model.py:12-53)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sir_gcn_tpu.data.batching import GraphCollection
from sir_gcn_tpu.data.loaders import has_cache
from sir_gcn_tpu.models import Embed
from sir_gcn_tpu.train import aggregate_runs
from sir_gcn_tpu.train.metrics import balanced_accuracy

from experiments.batched_harness import run_batched_workload
from experiments.batched_harness import apply_self_loops
from experiments.common_models import GraphSIRModel


def synthetic_sbm(num_graphs, num_nodes, num_classes, seed):
    """PATTERN/CLUSTER-shaped SBM: block-structured random graphs; the
    per-node label is the block id; features are noisy block hints (the
    real datasets' one-hot vocab)."""
    rng = np.random.default_rng(seed)
    graphs, nfeats, nlabels = [], [], []
    for _ in range(num_graphs):
        n = int(rng.integers(num_nodes // 2, num_nodes + 1))
        blocks = rng.integers(0, num_classes, n)
        p_in, p_out = 0.5, 0.2
        probs = np.where(blocks[:, None] == blocks[None, :], p_in, p_out)
        adj = rng.random((n, n)) < probs
        np.fill_diagonal(adj, False)
        src, dst = np.nonzero(adj)
        # features: block hint with prob 0.5, else "unknown" (= classes)
        hint = rng.random(n) < 0.5
        feats = np.where(hint, blocks, num_classes).astype(np.int32)
        graphs.append((src.astype(np.int32), dst.astype(np.int32), n))
        nfeats.append(feats)
        nlabels.append(blocks.astype(np.int32))
    return graphs, nfeats, nlabels


def load_cached(name):
    """npz layout: zinc-style offsets + per-node labels in node_label."""
    from sir_gcn_tpu.data.loaders import _cache_path

    z = np.load(_cache_path(name))
    graphs, nfeats, nlabels = [], [], []
    on, oe = z["offsets_nodes"], z["offsets_edges"]
    for i in range(len(on) - 1):
        graphs.append((z["src"][oe[i]:oe[i + 1]],
                       z["dst"][oe[i]:oe[i + 1]],
                       int(on[i + 1] - on[i])))
        nfeats.append(z["node_feat"][on[i]:on[i + 1]])
        nlabels.append(z["node_label"][on[i]:on[i + 1]])
    return (graphs, nfeats, nlabels,
            (z["train_idx"], z["val_idx"], z["test_idx"]))


def run_single(args, seed):
    name = f"sbm-{args.dataset.lower()}"
    num_classes = 2 if args.dataset == "PATTERN" else 6
    if has_cache(name):
        graphs, nfeats, nlabels, (tr, va, te) = load_cached(name)
        input_dim = int(max(f.max() for f in nfeats)) + 1
    else:
        graphs, nfeats, nlabels = synthetic_sbm(
            args.synthetic_samples, 40, num_classes, seed)
        print("[warn] no SBM cache; synthetic stand-in")
        input_dim = num_classes + 1
        n = len(graphs)
        idx = np.arange(n)
        tr, va, te = (idx[:int(0.8 * n)], idx[int(0.8 * n):int(0.9 * n)],
                      idx[int(0.9 * n):])

    if args.add_self_loop:
        graphs, _ = apply_self_loops(graphs, None)
    coll = GraphCollection(graphs, node_feats=nfeats, node_labels=nlabels)

    if args.model == "GAT":
        from experiments.common_models import GraphGATModel

        def encoder(mdl, feats):
            # reference sbm model.py:69: Embedding(input, heads*hidden)
            return Embed(input_dim, args.nheads * args.nhidden,
                         name="node_encoder")(feats)

        model = GraphGATModel(
            encoder=encoder, hidden_dim=args.nhidden,
            output_dim=num_classes, num_layers=args.nlayers,
            input_dropout=args.input_dropout,
            edge_dropout=args.edge_dropout, dropout=args.dropout,
            norm=args.norm, readout_layers=args.readout_layers,
            readout_dropout=args.readout_dropout,
            jumping_knowledge=args.jumping_knowledge,
            residual=args.residual, num_heads=args.nheads,
            attn_dropout=args.attn_dropout, pool_after_readout=False,
        )
    else:
        def encoder(mdl, feats):
            return Embed(input_dim, args.nhidden,
                         name="node_encoder")(feats)

        model = GraphSIRModel(
            encoder=encoder, hidden_dim=args.nhidden,
            output_dim=num_classes,
            num_layers=args.nlayers, input_dropout=args.input_dropout,
            edge_dropout=args.edge_dropout, dropout=args.dropout,
            norm=args.norm, readout_layers=args.readout_layers,
            readout_dropout=args.readout_dropout,
            jumping_knowledge=args.jumping_knowledge,
            residual=args.residual, resid_layers=args.resid_layers,
            resid_dropout=args.resid_dropout,
            feat_dropout=args.feat_dropout,
            agg_type=args.agg_type, pool_after_readout=False,
        )

    def weighted_ce(preds, labels, weights):
        """Class-weighted CE, weights from the batch label histogram
        (reference train.py:52-56: w_c = (n - n_c) * (n_c > 0) / n)."""
        labels = labels.astype(jnp.int32)
        n = jnp.maximum(jnp.sum(weights), 1.0)
        counts = jnp.zeros(num_classes).at[labels].add(weights)
        cw = (n - counts) * (counts > 0) / n
        logp = jax.nn.log_softmax(preds)
        ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
        w = weights * jnp.take(cw, labels)
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-9)

    return run_batched_workload(
        model=model, coll=coll, train_idx=tr, val_idx=va, test_idx=te,
        args=args, seed=seed, loss_fn=weighted_ce,
        metric_fn=lambda p, l: balanced_accuracy(
            p, l.astype(np.int64), num_classes),
        minimize_metric=False, warmup_size=10, node_level=True,
        label_dtype=jnp.int32,
    )


def main(argv=None):
    p = argparse.ArgumentParser(
        "SIR-GCN implementation on SBM PATTERN/CLUSTER (TPU-native)",
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
    p.add_argument("--dataset", type=str, default="PATTERN",
                   choices=["PATTERN", "CLUSTER"])
    p.add_argument("--model", type=str, default="SIR",
                   choices=["SIR", "GAT"])
    p.add_argument("--nheads", type=int, default=1,
                   help="number of attention heads (GAT)")
    p.add_argument("--attn-dropout", type=float, default=0,
                   help="attention dropout rate (GAT)")
    p.add_argument("--nhidden", type=int, default=64)
    p.add_argument("--nlayers", type=int, default=4)
    p.add_argument("--input-dropout", type=float, default=0)
    p.add_argument("--edge-dropout", type=float, default=0)
    p.add_argument("--dropout", type=float, default=0)
    p.add_argument("--norm", type=str, default="none",
                   choices=["gn", "cn", "bn", "ln", "none"])
    p.add_argument("--readout-layers", type=int, default=1)
    p.add_argument("--readout-dropout", type=float, default=0)
    p.add_argument("--jumping-knowledge", action="store_true")
    p.add_argument("--residual", action="store_true")
    p.add_argument("--resid-layers", type=int, default=0)
    p.add_argument("--resid-dropout", type=float, default=0)
    p.add_argument("--feat-dropout", type=float, default=0)
    p.add_argument("--agg-type", type=str, default="mean",
                   choices=["sum", "max", "mean", "sym"])
    p.add_argument("--add-self-loop", action="store_true")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--dp-devices", type=int, default=0,
                   help="data-parallel devices on a 'data' mesh axis "
                        "(0/1 = single device)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=0)
    p.add_argument("--l1", type=float, default=0)
    p.add_argument("--l2", type=float, default=0)
    p.add_argument("--factor", type=float, default=0.5)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--nruns", type=int, default=10)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--synthetic-samples", type=int, default=500)
    args = p.parse_args(argv)
    from sir_gcn_tpu.utils import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: first-in-container compiles only
    if args.edge_bf16:
        from sir_gcn_tpu.ops import set_edge_dtype
        set_edge_dtype(jnp.bfloat16)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    val_accs, test_accs = [], []
    for i in range(args.nruns):
        r = run_single(args, args.seed + i)
        val_accs.append(r["val_metric"])
        test_accs.append(r["test_metric"])

    print(f"Runned {args.nruns} times")
    aggregate_runs("val balanced accuracy", val_accs)
    aggregate_runs("test balanced accuracy", test_accs)
    return val_accs, test_accs


if __name__ == "__main__":
    main()
