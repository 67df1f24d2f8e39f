"""Shared training harness for batched-graph workloads (ZINC, molhiv, SBM,
super-pixel). The reference copy-pastes this loop per experiment
(``benchmark-datasets/zinc/train.py:55-128`` etc.); here it is one engine:
jitted train/eval steps over fixed-bucket batches, linear warmup + plateau
scheduling, best-by-validation selection, n-runs aggregation.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable, Optional

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sir_gcn_tpu.data.batching import GraphCollection
from sir_gcn_tpu.data.prefetch import prefetch
from sir_gcn_tpu.train import (
    EpochDriver,
    init_state,
    l1_l2_regularizer,
    make_adamw,
    param_count,
    set_lr_scale,
    set_seed,
)


def run_batched_workload(
    *,
    model,
    coll: GraphCollection,
    train_idx: np.ndarray,
    val_idx: Optional[np.ndarray],
    test_idx: np.ndarray,
    args,
    seed: int,
    loss_fn: Callable,        # (preds [G_pad,...], labels, weights) -> scalar
    metric_fn: Callable,      # (preds np, labels np) -> float  (per split)
    minimize_metric: bool,
    warmup_size: int = 10,
    has_edge_feats: bool = False,
    label_dtype=jnp.float32,
    node_level: bool = False,
):
    """Train the model, return a result dict with best val/test metrics."""
    key = set_seed(seed)
    batch_size = args.batch_size

    first = coll.collate(np.asarray(train_idx)[:batch_size], batch_size)
    key, ik = jax.random.split(key)
    apply_args = [first["graph"], jnp.asarray(first["node_feats"])]
    if has_edge_feats:
        apply_args.append(jnp.asarray(first["edge_feats"]))
    variables = model.init(ik, *apply_args)
    tx = make_adamw(args.lr, args.wd)
    state = init_state(variables, tx)
    print(f"Params: {param_count(state.params)}")

    l1 = getattr(args, "l1", 0.0)
    l2 = getattr(args, "l2", 0.0)

    def forward(params, batch_stats, batch, det, rng):
        a = [batch["graph"], batch["node_feats"]]
        if has_edge_feats:
            a.append(batch["edge_feats"])
        variables = {"params": params, "batch_stats": batch_stats}
        if det:
            preds = model.apply(variables, *a, deterministic=True)
            return preds, batch_stats
        preds, upd = model.apply(variables, *a, deterministic=False,
                                 rngs={"dropout": rng},
                                 mutable=["batch_stats"])
        return preds, upd.get("batch_stats", {})

    @jax.jit
    def train_step(state, rng, batch):
        def lf(params):
            preds, bs = forward(params, state.batch_stats, batch, False,
                                rng)
            if node_level:
                loss = loss_fn(preds, batch["node_labels"],
                               batch["node_weights"])
            else:
                loss = loss_fn(preds, batch["labels"],
                               batch["graph_weights"])
            return loss + l1_l2_regularizer(params, l1, l2), bs

        (loss, bs), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=bs), loss

    dp = int(getattr(args, "dp_devices", 0) or 0)
    dp_step = None
    if dp > 1:
        # SURVEY §2c P1: per-device graph buckets, psum'd gradients over
        # the 'data' mesh axis; batch_stats pmean-synced. The remainder
        # (< dp batches at epoch end) runs the single-device step.
        from sir_gcn_tpu.parallel import make_mesh
        from sir_gcn_tpu.parallel.data_parallel import (
            make_dp_train_step_stateful,
            stack_device_batches,
        )

        dp_mesh = make_mesh((dp,), ("data",),
                            devices=jax.devices()[:dp])

        def dp_loss(params, batch_stats, batch, rng):
            preds, bs = forward(params, batch_stats, batch, False, rng)
            if node_level:
                loss = loss_fn(preds, batch["node_labels"],
                               batch["node_weights"])
            else:
                loss = loss_fn(preds, batch["labels"],
                               batch["graph_weights"])
            return loss + l1_l2_regularizer(params, l1, l2), bs

        dp_step = make_dp_train_step_stateful(dp_loss, tx, dp_mesh)

    @jax.jit
    def eval_step(state, batch):
        preds, _ = forward(state.params, state.batch_stats, batch, True,
                           None)
        if node_level:
            loss = loss_fn(preds, batch["node_labels"],
                           batch["node_weights"])
        else:
            loss = loss_fn(preds, batch["labels"], batch["graph_weights"])
        return preds, loss

    def to_device(b):
        out = {"graph": b["graph"]}
        for k in ("node_feats", "edge_feats", "labels", "graph_weights",
                  "node_labels", "node_weights"):
            if k in b:
                out[k] = jnp.asarray(b[k])
        for k in ("labels", "node_labels"):
            if k in out:
                out[k] = out[k].astype(label_dtype)
        return out

    def evaluate(idx):
        losses, preds_all, labels_all = [], [], []
        for b in coll.loader(np.asarray(idx), batch_size):
            db = to_device(b)
            preds, loss = eval_step(state, db)
            losses.append(float(loss))
            if node_level:
                w = b["node_weights"].astype(bool)
                preds_all.append(np.asarray(preds)[w])
                labels_all.append(np.asarray(b["node_labels"])[w])
            else:
                w = b["graph_weights"].astype(bool)
                preds_all.append(np.asarray(preds)[w])
                labels_all.append(np.asarray(b["labels"])[w])
        metric = metric_fn(np.concatenate(preds_all),
                           np.concatenate(labels_all))
        return float(np.mean(losses)), metric

    driver = EpochDriver(epochs=args.epochs, warmup=warmup_size,
                         factor=args.factor, patience=args.patience,
                         log_every=args.log_every)
    shuffle_rng = np.random.default_rng(seed + 12345)
    best = None
    better = (lambda a, b: a < b) if minimize_metric else \
        (lambda a, b: a > b)

    t_epochs = time.perf_counter()
    for epoch in range(1, args.epochs + 1):
        # warmup/plateau LR applies to THIS epoch's steps
        state = set_lr_scale(state, driver.lr_scale(epoch))
        if dp_step is not None:
            group = []
            for b in prefetch(coll.loader(np.asarray(train_idx),
                                          batch_size, shuffle_rng)):
                group.append(to_device(b))
                if len(group) == dp:
                    key, sk = jax.random.split(key)
                    p, o, bs, _ = dp_step(
                        state.params, state.opt_state, state.batch_stats,
                        stack_device_batches(group),
                        jax.random.split(sk, dp))
                    state = state.replace(params=p, opt_state=o,
                                          batch_stats=bs)
                    group = []
            for db in group:  # remainder: single-device step
                key, sk = jax.random.split(key)
                state, _ = train_step(state, sk, db)
        else:
            for b in prefetch(coll.loader(np.asarray(train_idx),
                                          batch_size, shuffle_rng)):
                key, sk = jax.random.split(key)
                state, _ = train_step(state, sk, to_device(b))

        loss, metric = evaluate(train_idx)
        if val_idx is not None:
            val_loss, val_metric = evaluate(val_idx)
        else:
            val_loss, val_metric = loss, metric
        test_loss, test_metric = evaluate(test_idx)
        driver.plateau_step(epoch, loss)

        if best is None or better(val_metric, best["val_metric"]):
            best = dict(val_loss=val_loss, val_metric=val_metric,
                        test_loss=test_loss, test_metric=test_metric)

        if driver.should_log(epoch):
            print(f"Epoch {epoch:04d} | loss: {loss:.4f} | "
                  f"metric: {metric:.4f} | val: {val_metric:.4f} | "
                  f"test: {test_metric:.4f}")

    # perf telemetry (VERDICT r2 item 9): wall per epoch over all train
    # batches + the three evaluate() passes (each fetches, a hard sync)
    dt = (time.perf_counter() - t_epochs) / max(args.epochs, 1)
    print(f"step_time_ms: {dt * 1e3:.1f} (train+eval wall per epoch, "
          f"{args.epochs} epochs)")
    return best


def apply_self_loops(graphs, edge_feats):
    """``dgl.transforms.AddSelfLoop`` equivalent on (src, dst, n) triples:
    remove existing loops, append one loop per node; new loop edges get
    zero-filled edge features (DGL frame padding semantics)."""
    from sir_gcn_tpu import add_self_loops, remove_self_loops

    out_g, out_e = [], [] if edge_feats is not None else None
    for i, (s, d, n) in enumerate(graphs):
        s = np.asarray(s)
        d = np.asarray(d)
        keep = s != d
        s2, d2 = add_self_loops(s[keep], d[keep], n)
        out_g.append((s2.astype(np.int32), d2.astype(np.int32), n))
        if edge_feats is not None:
            ef = np.asarray(edge_feats[i])[keep]
            pad = np.zeros((n,) + ef.shape[1:], ef.dtype)
            out_e.append(np.concatenate([ef, pad]))
    return out_g, out_e
