"""MNIST/CIFAR10 super-pixel harness (reference
``benchmark-datasets/super-pixel/train.py``): batched graph classification,
CE loss, accuracy, first 5000 training graphs held out as validation
(train.py:48-49), optional ``--use-feature`` raw-pixel features. Model:
input-dropout on raw features + SIRConv stack + JK readouts + pooling
(model.py:12-55)."""

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
from sir_gcn_tpu.train import aggregate_runs
from sir_gcn_tpu.train.metrics import accuracy

from experiments.batched_harness import run_batched_workload
from experiments.batched_harness import apply_self_loops
from experiments.common_models import GraphSIRModel


def synthetic_superpixel(num_graphs, num_classes, use_feature, seed):
    """Super-pixel-shaped synthetic: ~70-node kNN-ish geometric graphs whose
    class determines a feature pattern."""
    rng = np.random.default_rng(seed)
    graphs, nfeats, labels = [], [], []
    for _ in range(num_graphs):
        n = int(rng.integers(60, 76))
        xy = rng.random((n, 2)).astype(np.float32)
        d2 = ((xy[:, None] - xy[None, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        k = 8
        nn_idx = np.argsort(d2, 1)[:, :k]
        src = np.repeat(np.arange(n), k).astype(np.int32)
        dst = nn_idx.reshape(-1).astype(np.int32)
        y = int(rng.integers(0, num_classes))
        base = np.sin(xy @ np.asarray([[1.0], [2.0]]) * (y + 1)).astype(
            np.float32)
        feat_dim = 3 if use_feature else 1
        fe = np.concatenate(
            [base, xy], 1).astype(np.float32) if use_feature else base
        graphs.append((src, dst, n))
        nfeats.append(fe + 0.1 * rng.normal(size=(n, feat_dim)).astype(
            np.float32))
        labels.append(y)
    return graphs, nfeats, np.asarray(labels, np.int64)


def run_single(args, seed):
    num_classes = 10
    name = f"superpixel-{args.dataset.lower()}"
    if has_cache(name):
        from sir_gcn_tpu.data.loaders import _cache_path

        z = np.load(_cache_path(name))
        graphs, nfeats = [], []
        on, oe = z["offsets_nodes"], z["offsets_edges"]
        for i in range(len(on) - 1):
            graphs.append((z["src"][oe[i]:oe[i + 1]],
                           z["dst"][oe[i]:oe[i + 1]],
                           int(on[i + 1] - on[i])))
            nfeats.append(z["node_feat"][on[i]:on[i + 1]].astype(
                np.float32))
        labels = z["labels"].astype(np.int64)
        tr, va, te = z["train_idx"], z["val_idx"], z["test_idx"]
    else:
        graphs, nfeats, labels = synthetic_superpixel(
            args.synthetic_samples, num_classes, args.use_feature, seed)
        print("[warn] no super-pixel cache; synthetic stand-in")
        n = len(graphs)
        idx = np.arange(n)
        n_val = min(n // 5, 5000)
        va, tr = idx[:n_val], idx[n_val:int(0.9 * n)]
        te = idx[int(0.9 * n):]
    if args.add_self_loop:
        graphs, _ = apply_self_loops(graphs, None)
    coll = GraphCollection(graphs, node_feats=nfeats, labels=labels)

    common = dict(
        encoder=lambda mdl, f: f,  # raw features (model.py:40)
        hidden_dim=args.nhidden, output_dim=num_classes,
        num_layers=args.nlayers, input_dropout=args.input_dropout,
        edge_dropout=args.edge_dropout, dropout=args.dropout,
        norm=args.norm, readout_layers=args.readout_layers,
        readout_dropout=args.readout_dropout,
        readout_pooling=args.readout_pooling,
        jumping_knowledge=args.jumping_knowledge,
        residual=args.residual, resid_layers=args.resid_layers,
        resid_dropout=args.resid_dropout,
    )
    if args.model == "SIR":
        model = GraphSIRModel(feat_dropout=args.feat_dropout,
                              agg_type=args.agg_type, **common)
    else:
        from experiments.common_models import GraphGINModel

        model = GraphGINModel(mlp_layers=args.nlayers_mlp,
                              agg_type=args.agg_type, **common)

    def ce(preds, labels, weights):
        labels = labels.astype(jnp.int32)
        logp = jax.nn.log_softmax(preds)
        cel = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
        return jnp.sum(cel * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    return run_batched_workload(
        model=model, coll=coll, train_idx=tr, val_idx=va, test_idx=te,
        args=args, seed=seed, loss_fn=ce,
        metric_fn=lambda p, l: accuracy(p, l.astype(np.int64)),
        minimize_metric=False, warmup_size=10, label_dtype=jnp.int32,
    )


def main(argv=None):
    p = argparse.ArgumentParser(
        "SIR-GCN implementation on MNIST/CIFAR10 super-pixels (TPU-native)",
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
    p.add_argument("--dataset", type=str, default="MNIST",
                   choices=["MNIST", "CIFAR10"])
    p.add_argument("--model", type=str, default="SIR",
                   choices=["SIR", "GIN"])
    p.add_argument("--nlayers-mlp", type=int, default=2)
    p.add_argument("--use-feature", action="store_true")
    p.add_argument("--nhidden", type=int, default=64)
    p.add_argument("--nlayers", type=int, default=4)
    p.add_argument("--input-dropout", type=float, default=0)
    p.add_argument("--edge-dropout", type=float, default=0)
    p.add_argument("--dropout", type=float, default=0)
    p.add_argument("--norm", type=str, default="none",
                   choices=["gn", "cn", "bn", "ln", "none"])
    p.add_argument("--readout-layers", type=int, default=1)
    p.add_argument("--readout-dropout", type=float, default=0)
    p.add_argument("--readout-pooling", type=str, default="sum",
                   choices=["sum", "mean"])
    p.add_argument("--jumping-knowledge", action="store_true")
    p.add_argument("--residual", action="store_true")
    p.add_argument("--resid-layers", type=int, default=0)
    p.add_argument("--resid-dropout", type=float, default=0)
    p.add_argument("--feat-dropout", type=float, default=0)
    p.add_argument("--agg-type", type=str, default="sum",
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
    aggregate_runs("val accuracy", val_accs)
    aggregate_runs("test accuracy", test_accs)
    return val_accs, test_accs


if __name__ == "__main__":
    main()
