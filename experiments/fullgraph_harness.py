"""Shared full-graph node-classification harness (wiki-cs, heterophilous).

One jitted train/eval step over the whole (padded) graph, masked losses per
split, 10-epoch warmup + plateau scheduling, best-by-val-loss selection —
the ``run`` skeleton of ``benchmark-datasets/wiki-cs/train.py:60-115`` and
``benchmark-datasets/heterophilous-datasets/train.py:67-124``.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sir_gcn_tpu.train import (
    EpochDriver,
    init_state,
    l1_l2_regularizer,
    make_adamw,
    param_count,
    set_lr_scale,
    set_seed,
)


def masked_ce(logits, labels, w):
    logp = jax.nn.log_softmax(logits)
    ce = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                              1)[:, 0]
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def masked_bce_logits(logits, labels, w):
    z = logits[:, 0] if logits.ndim > 1 else logits
    ce = jnp.maximum(z, 0) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def setup_mesh_graph(graph, args):
    """Shared --mesh-devices setup for full-graph workloads (SURVEY §2c
    P2): returns ``(graph, feats_sharding, mesh)`` —
    ``(graph, None, None)`` when single-device. Re-pads the graph to a
    mesh-divisible node count if needed, then wraps it for the
    boundary-only halo fast path (default) or GSPMD-partitions the CSR
    (``--dist-path gspmd``, or automatically when the model/aggregator
    is outside the halo path's support)."""
    mesh_n = int(getattr(args, "mesh_devices", 0) or 0)
    if mesh_n <= 1:
        return graph, None, None
    from sir_gcn_tpu import build_graph
    from sir_gcn_tpu.ops.ell import FastGraph
    from sir_gcn_tpu.parallel import make_mesh, shard_full_graph
    from sir_gcn_tpu.parallel.full_graph import node_sharding

    if isinstance(graph, FastGraph):
        graph = graph.graph  # re-partition the plain CSR
    if graph.n_pad % mesh_n != 0:
        # rebuild with a mesh-divisible pad from the real edges (padding
        # edges sit at the tail of the dst-sorted arrays)
        n_e = int(np.asarray(graph.edge_mask).sum())
        n = int(np.asarray(graph.node_mask).sum())
        graph = build_graph(np.asarray(graph.src)[:n_e],
                            np.asarray(graph.dst)[:n_e], n,
                            pad_multiple=128 * mesh_n)
    mesh = make_mesh((mesh_n,), ("graph",),
                     devices=jax.devices()[:mesh_n])
    agg = getattr(args, "agg_type", "sum")
    use_halo = (getattr(args, "dist_path", "halo") == "halo"
                and "SIR" in getattr(args, "model", "SIR")
                and agg in ("sum", "mean", "sym"))
    if getattr(args, "dist_path", "halo") == "halo" and not use_halo:
        print("[note] halo path needs a SIR model with a linear "
              "aggregator; using the GSPMD-partitioned CSR instead")
    if use_halo:
        from sir_gcn_tpu.parallel.halo import build_halo_graph

        graph = build_halo_graph(graph, mesh_n, mesh, agg_type=agg)
    else:
        graph = shard_full_graph(graph, mesh)
    return graph, node_sharding(mesh), mesh


def run_fullgraph_workload(
    *,
    model,
    graph,
    feats: np.ndarray,          # [n_pad, D]
    labels: np.ndarray,         # [n_pad]
    masks: tuple,               # (train_w, val_w, test_w) float [n_pad]
    args,
    seed: int,
    loss_fn: Callable = masked_ce,
    metric_fn: Callable = None,  # (logits np, labels np) -> float
    warmup_size: int = 10,
    dtype=jnp.float32,
):
    key = set_seed(seed)
    train_w, val_w, test_w = masks

    graph, feats_sharding, mesh = setup_mesh_graph(graph, args)
    if feats_sharding is not None and graph.n_pad > feats.shape[0]:
        # the graph was re-padded to a mesh-divisible size; grow the
        # node-indexed arrays with zero rows (padding semantics)
        grow = graph.n_pad - feats.shape[0]

        def _grow(a):
            return np.concatenate(
                [a, np.zeros((grow,) + a.shape[1:], a.dtype)])

        feats, labels = _grow(feats), _grow(labels)
        train_w, val_w, test_w = map(_grow, (train_w, val_w, test_w))

    feats_j = jnp.asarray(feats, dtype)
    labels_j = jnp.asarray(labels)
    if feats_sharding is not None:
        feats_j = jax.device_put(feats_j, feats_sharding)
        labels_j = jax.device_put(labels_j, feats_sharding)
    key, ik = jax.random.split(key)
    variables = model.init(ik, graph, feats_j)
    if feats_sharding is not None:
        from sir_gcn_tpu.parallel.full_graph import replicated

        variables = jax.device_put(variables, replicated(mesh))
    tx = make_adamw(args.lr, args.wd)
    state = init_state(variables, tx)
    print(f"Params: {param_count(state.params)}")

    tw = jnp.asarray(train_w)

    @jax.jit
    def train_step(state, rng, feats, labels):
        def lf(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            logits, upd = model.apply(
                variables, graph, feats, deterministic=False,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = (loss_fn(logits, labels, tw)
                    + l1_l2_regularizer(params, getattr(args, "l1", 0.0),
                                        getattr(args, "l2", 0.0)))
            return loss, upd.get("batch_stats", {})

        (loss, bs), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=bs), loss

    @jax.jit
    def eval_step(state, feats):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        return model.apply(variables, graph, feats, deterministic=True)

    driver = EpochDriver(epochs=args.epochs, warmup=warmup_size,
                         factor=args.factor, patience=args.patience,
                         log_every=args.log_every)
    best = None
    t_epochs = time.perf_counter()
    for epoch in range(1, args.epochs + 1):
        # warmup/plateau LR applies to THIS epoch's step
        state = set_lr_scale(state, driver.lr_scale(epoch))
        key, sk = jax.random.split(key)
        state, _ = train_step(state, sk, feats_j, labels_j)

        logits = np.asarray(eval_step(state, feats_j))
        metrics = {}
        for name, w in (("", train_w), ("val_", val_w),
                        ("test_", test_w)):
            idx = w.astype(bool)
            lw = jnp.asarray(w)
            metrics[f"{name}loss"] = float(
                loss_fn(jnp.asarray(logits), labels_j, lw))
            metrics[f"{name}metric"] = metric_fn(logits[idx], labels[idx])

        driver.plateau_step(epoch, metrics["loss"])
        if best is None or metrics["val_loss"] < best["val_loss"]:
            best = dict(metrics)
        if driver.should_log(epoch):
            print(f"Epoch {epoch:04d} | "
                  + " | ".join(f"{k}: {v:.4f}"
                               for k, v in metrics.items()))
    # perf telemetry (VERDICT r2 item 9): epoch wall includes the train
    # step dispatch AND the eval fetch (a hard sync), so regressions in
    # the model layer surface here, outside bench.py. Not a kernel-level
    # timing — the tunneled runtime makes per-dispatch timing unreliable
    # (see bench.py) — but comparable run-to-run.
    dt = (time.perf_counter() - t_epochs) / max(args.epochs, 1)
    print(f"step_time_ms: {dt * 1e3:.1f} (train+eval wall per epoch, "
          f"{args.epochs} epochs)")
    return best
