"""ogbn-arxiv full-graph training harness (reference
``benchmark-datasets/ogbn-arxiv/train.py``): log-softened cross-entropy
(train.py:71-75), label trick + label-reuse iterations (train.py:93-96,
120-131), mask-rate subsampling (train.py:107-108), FLAG adversarial
perturbation (train.py:110-119,140-145), knowledge distillation
(train.py:85-87,134-136), 20-epoch linear warmup, best-by-val-loss
selection, prediction saving for KD/C&S.

With no dataset cache present (zero-egress container) a synthetic
arxiv-shaped task is substituted and parity numbers are labelled synthetic.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sir_gcn_tpu import (
    add_self_loops,
    build_graph,
    permute_nodes,
    rcm_order,
    remove_self_loops,
    reverse_edges,
    to_bidirected,
)
from sir_gcn_tpu.data.loaders import load_node_classification
from sir_gcn_tpu.train import (
    EpochDriver,
    aggregate_runs,
    init_state,
    l1_l2_regularizer,
    make_adamw,
    param_count,
    set_lr_scale,
    set_seed,
)

from experiments.ogbn_arxiv.model import GATModel, SIRModel

MODELS = {"SIR": SIRModel, "GAT": GATModel}
EPS = 1.0 - np.log(2.0)
METRIC_KEYS = ("loss", "acc", "val_loss", "val_acc",
               "test_loss", "test_acc")


def _ckpt_payload(state, driver, best_val_loss, result, n_pad,
                  num_classes):
    """Everything needed for a bitwise-exact resume: train state, plateau
    scheduler scalars, and the best-so-far selection (metrics + logits).
    The framework improvement over the reference, which has no model
    checkpointing at all (SURVEY §5)."""
    pl = driver.plateau
    best = np.array([result.get(k, 0.0) for k in METRIC_KEYS], np.float64)
    logits = result.get("logits")
    if logits is None:
        logits = np.zeros((n_pad, num_classes), np.float32)
    return {"state": state,
            "plateau": np.array([pl.best, pl.num_bad, pl.scale],
                                np.float64),
            "best_val_loss": np.float64(best_val_loss),
            "best_metrics": best,
            "best_logits": np.asarray(logits, np.float32)}


def build_arxiv_graph(data, args):
    """Graph transforms exactly as load_dataset (reference train.py:42-55):
    bidirect or reverse, then optional self-loop refresh. On TPU the graph
    is wrapped with ELL fast-path plans (ops/ell.py) unless --no-fast-path
    is given. With --mesh-devices > 1 the padded node range is made
    divisible by the mesh so the GSPMD edge partition is even."""
    src, dst = data.src, data.dst
    if args.add_reverse_edge:
        src, dst = to_bidirected(src, dst)
    else:
        src, dst = reverse_edges(src, dst)
    if args.add_self_loop:
        src, dst = remove_self_loops(src, dst)
        src, dst = add_self_loops(src, dst, data.feat.shape[0])
    n_mesh = getattr(args, "mesh_devices", 0)
    pad = 128 * n_mesh if n_mesh > 1 else 128
    graph = build_graph(src, dst, data.feat.shape[0], pad_multiple=pad)
    if n_mesh > 1 or getattr(args, "no_fast_path", False):
        return graph  # GSPMD path partitions the plain CSR GraphBatch
    from sir_gcn_tpu.ops.ell import build_fast_graph

    return build_fast_graph(graph)


def masked_mean(x, w):
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def soft_ce(logits, labels, w):
    """Log-softened CE: mean(log(CE + eps) - log(eps)) (train.py:71-75)."""
    logp = jax.nn.log_softmax(logits)
    ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
    return masked_mean(jnp.log(ce + EPS) - np.log(EPS), w)


def make_harness(model, graph, args, num_classes, tx):
    """Builds the jitted train/eval steps closed over the static graph."""

    def forward(params, batch_stats, feats, perturb, det, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if det:
            logits = model.apply(variables, graph, feats, perturb,
                                 deterministic=True)
            return logits, batch_stats
        logits, upd = model.apply(
            variables, graph, feats, perturb, deterministic=False,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        return logits, upd.get("batch_stats", {})

    def assemble(feats, labels, labeled_mask):
        if not args.use_labels:
            return feats
        one_hot = (jax.nn.one_hot(labels, num_classes)
                   * labeled_mask[:, None])
        return jnp.concatenate([feats, one_hot], -1)

    def label_reuse(params, batch_stats, feats, perturb, unlabeled_mask,
                    det, rng, logits):
        # train.py:126-131 — refine by writing softmax probs of unlabeled
        # rows into the label slot and re-running the model
        for _ in range(args.label_iters):
            logits = jax.lax.stop_gradient(logits)
            probs = jax.nn.softmax(logits)
            lab = feats[:, -num_classes:]
            lab = jnp.where(unlabeled_mask[:, None], probs, lab)
            feats = jnp.concatenate([feats[:, :-num_classes], lab], -1)
            logits, batch_stats = forward(params, batch_stats, feats,
                                          perturb, det, rng)
        return logits, batch_stats

    @jax.jit
    def train_step(state, key, feats, labels, labeled_mask, loss_w,
                   unlabeled_mask, train_node_mask, kd_teacher):
        m = args.m + 1 if args.flag else 1

        def loss_fn(params, batch_stats, perturb, rng):
            f = assemble(feats, labels, labeled_mask)
            # FLAG perturb covers the raw features only; the label-trick
            # columns get zeros (train.py:122)
            if args.use_labels and not isinstance(perturb, (int, float)):
                perturb = jnp.concatenate(
                    [perturb, jnp.zeros((f.shape[0], num_classes),
                                        f.dtype)], -1)
            logits, batch_stats = forward(params, batch_stats, f, perturb,
                                          False, rng)
            if args.use_labels and args.label_iters > 0:
                logits, batch_stats = label_reuse(
                    params, batch_stats, f, perturb, unlabeled_mask,
                    False, rng, logits)
            loss = (soft_ce(logits, labels, loss_w)
                    + l1_l2_regularizer(params, args.l1, args.l2)) / m
            if args.kd_mode == "student":
                t = args.kd_temp
                logp = jax.nn.log_softmax(logits / t)
                p_teacher = jax.nn.softmax(kd_teacher / t)
                kd = (t * t) * jnp.mean(jnp.sum(
                    p_teacher * (jnp.log(jnp.maximum(p_teacher, 1e-12))
                                 - logp), -1))
                loss = loss * (1 - args.kd_alpha) + kd / m * args.kd_alpha
            return loss, batch_stats

        bs = state.batch_stats
        if args.flag:
            key, pk = jax.random.split(key)
            perturb = jax.random.uniform(
                pk, feats.shape, feats.dtype,
                -args.untrain_step_size, args.untrain_step_size)
            scale = jnp.where(train_node_mask[:, None],
                              args.train_step_size / args.untrain_step_size,
                              1.0)
            perturb = perturb * scale
            total_loss = 0.0
            grads_acc = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            for _ in range(m):
                key, rk = jax.random.split(key)
                (loss, bs), (gp, gpert) = jax.value_and_grad(
                    loss_fn, argnums=(0, 2), has_aux=True)(
                    state.params, bs, perturb, rk)
                grads_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b, grads_acc, gp)
                total_loss = total_loss + loss
                step = jnp.where(train_node_mask[:, None],
                                 args.train_step_size,
                                 args.untrain_step_size)
                perturb = perturb + step * jnp.sign(gpert)
            grads, loss = grads_acc, total_loss
        else:
            key, rk = jax.random.split(key)
            (loss, bs), grads = jax.value_and_grad(
                loss_fn, argnums=0, has_aux=True)(
                state.params, bs, 0.0, rk)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=bs), loss

    @jax.jit
    def eval_step(state, feats, labels, labeled_mask, unlabeled_mask):
        f = assemble(feats, labels, labeled_mask)
        logits, _ = forward(state.params, state.batch_stats, f, 0.0,
                            True, None)
        if args.use_labels and args.label_iters > 0:
            logits, _ = label_reuse(state.params, state.batch_stats, f,
                                    0.0, unlabeled_mask, True, None, logits)
        return logits

    return train_step, eval_step


def reorder_data(data):
    """RCM-relabel the nodes for src-gather locality (graph.py:rcm_order).
    Training is equivariant to the relabeling; saved predictions are
    mapped back to the original order (see run_single), so KD / C&S
    pipelines are unaffected. Returns (perm, relabel)."""
    perm = rcm_order(data.src, data.dst, data.feat.shape[0])
    data.src, data.dst, relabel = permute_nodes(data.src, data.dst, perm)
    data.feat = data.feat[perm]
    data.labels = data.labels[perm]
    data.train_idx = relabel[data.train_idx]
    data.val_idx = relabel[data.val_idx]
    data.test_idx = relabel[data.test_idx]
    return perm, relabel


def run_single(args, seed: int, data, iter_idx: int):
    key = set_seed(seed)
    perm = relabel = None
    if args.reorder:
        perm, relabel = reorder_data(data)
    graph = build_arxiv_graph(data, args)
    n_pad = graph.n_pad
    num_classes = data.num_classes

    feats = np.zeros((n_pad, data.feat.shape[1]), np.float32)
    feats[: data.feat.shape[0]] = data.feat
    labels = np.zeros(n_pad, np.int32)
    labels[: data.labels.shape[0]] = data.labels

    def mask_of(idx):
        m = np.zeros(n_pad, np.float32)
        m[idx] = 1.0
        return m

    train_w, val_w, test_w = (mask_of(i) for i in
                              (data.train_idx, data.val_idx, data.test_idx))
    train_node_mask = train_w.astype(bool)

    model = MODELS[args.model](
        hidden_dim=args.nhidden, output_dim=num_classes,
        num_layers=args.nlayers, input_dropout=args.input_dropout,
        edge_dropout=args.edge_dropout, dropout=args.dropout,
        norm=args.norm, readout_layers=args.readout_layers,
        readout_dropout=args.readout_dropout,
        jumping_knowledge=args.jumping_knowledge,
        **({"residual": args.residual, "resid_layers": args.resid_layers,
            "resid_dropout": args.resid_dropout,
            "feat_dropout": args.feat_dropout, "agg_type": args.agg_type}
           if args.model == "SIR" else
           {"num_heads": args.nheads, "attn_dropout": args.attn_dropout,
            "residual": args.residual}),
    )
    # Edge-partitioned full-graph training (SURVEY §2c P2) over a 'graph'
    # mesh axis: boundary-only halo fast path by default, GSPMD CSR with
    # --dist-path gspmd (shared helper; no re-pad happens here because
    # build_arxiv_graph already pads mesh-divisibly).
    from experiments.fullgraph_harness import setup_mesh_graph

    graph, feats_sharding, mesh = setup_mesh_graph(graph, args)

    input_dim = feats.shape[1] + (num_classes if args.use_labels else 0)
    dummy = jnp.zeros((n_pad, input_dim), jnp.float32)
    key, ik = jax.random.split(key)
    variables = model.init(ik, graph, dummy)
    if feats_sharding is not None:
        from sir_gcn_tpu.parallel.full_graph import replicated

        variables = jax.device_put(variables, replicated(mesh))

    tx = make_adamw(args.lr, args.wd)
    state = init_state(variables, tx)
    print(f"Params: {param_count(state.params)}")

    train_step, eval_step = make_harness(model, graph, args, num_classes, tx)

    kd_teacher = jnp.zeros((n_pad, num_classes), jnp.float32)
    if args.kd_mode == "student":
        teacher = np.load(f"./output/teacher_{iter_idx}.npy")
        if perm is not None:  # teacher saved in original node order
            teacher = np.concatenate(
                [teacher[perm], teacher[len(perm):]], 0)
        kd_teacher = jnp.asarray(teacher)

    if feats_sharding is not None:
        feats_j = jax.device_put(jnp.asarray(feats), feats_sharding)
        labels_j = jax.device_put(jnp.asarray(labels), feats_sharding)
    else:
        feats_j = jnp.asarray(feats)
        labels_j = jnp.asarray(labels)
    driver = EpochDriver(epochs=args.epochs, warmup=20, factor=args.factor,
                         patience=args.patience, log_every=args.log_every)
    host_rng = np.random.default_rng(seed + 999)
    result = {}
    best_val_loss = np.inf

    eval_labeled = jnp.asarray(train_w)
    eval_unlabeled = jnp.asarray(
        np.clip(val_w + test_w, 0, 1) * graph_valid(n_pad, data))

    ckpt_dir = (os.path.join(args.ckpt_dir, f"run_{iter_idx}")
                if args.ckpt_dir else None)
    start_epoch = 1
    if ckpt_dir and args.resume:
        from sir_gcn_tpu.utils.checkpoint import (
            latest_step,
            load_checkpoint,
        )

        step = latest_step(ckpt_dir)
        if step is not None:
            target = _ckpt_payload(state, driver, np.inf, {}, n_pad,
                                   num_classes)
            r = load_checkpoint(ckpt_dir, target, step)
            state = r["state"]
            pb, pn, ps = np.asarray(r["plateau"])
            driver.plateau.best = float(pb)
            driver.plateau.num_bad = int(pn)
            driver.plateau.scale = float(ps)
            best_val_loss = float(r["best_val_loss"])
            if np.isfinite(best_val_loss):
                result = dict(zip(METRIC_KEYS,
                                  map(float, np.asarray(r["best_metrics"]))))
                result["logits"] = np.asarray(r["best_logits"])
            start_epoch = step + 1
            # fast-forward the host RNG and the PRNG key stream so the
            # resumed run is bitwise-identical to an uninterrupted one
            for _ in range(step):
                host_rng.random(len(data.train_idx))
                key, _ = jax.random.split(key)
            print(f"Resumed from {ckpt_dir} at epoch {step}")

    t_epochs = time.perf_counter()
    for epoch in range(start_epoch, args.epochs + 1):
        # mask-rate subsampling (train.py:107-108)
        sub = host_rng.random(len(data.train_idx)) < args.mask_rate
        tr_sub = data.train_idx[sub]
        loss_w = mask_of(tr_sub)
        labeled = mask_of(data.train_idx[~sub])  # label trick uses complement
        unlabeled = np.clip(train_w - labeled + val_w + test_w, 0, 1)

        # warmup/plateau LR applies to THIS epoch's step (train.py:189-190)
        state = set_lr_scale(state, driver.lr_scale(epoch))
        key, sk = jax.random.split(key)
        state, _ = train_step(
            state, sk, feats_j, labels_j, jnp.asarray(labeled),
            jnp.asarray(loss_w), jnp.asarray(unlabeled),
            jnp.asarray(train_node_mask), kd_teacher)

        logits = eval_step(state, feats_j, labels_j, eval_labeled,
                           eval_unlabeled)
        logits_np = np.asarray(logits)
        metrics = {}
        for name, w in (("", train_w), ("val_", val_w), ("test_", test_w)):
            idx = w.astype(bool)
            ce = _np_soft_ce(logits_np[idx], labels[idx])
            acc = float(np.mean(np.argmax(logits_np[idx], -1)
                                == labels[idx]))
            metrics[f"{name}loss"] = ce
            metrics[f"{name}acc"] = acc

        driver.plateau_step(epoch, metrics["loss"])

        if metrics["val_loss"] < best_val_loss:
            best_val_loss = metrics["val_loss"]
            result = dict(metrics, logits=logits_np)

        if ckpt_dir and args.ckpt_every and epoch % args.ckpt_every == 0:
            from sir_gcn_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(ckpt_dir, _ckpt_payload(
                state, driver, best_val_loss, result, n_pad,
                num_classes), step=epoch)

        if driver.should_log(epoch):
            print(f"Epoch {epoch:04d} | loss: {metrics['loss']:.4f} | "
                  f"acc: {metrics['acc']:.4f} | "
                  f"val_loss: {metrics['val_loss']:.4f} | "
                  f"val_acc: {metrics['val_acc']:.4f} | "
                  f"test_loss: {metrics['test_loss']:.4f} | "
                  f"test_acc: {metrics['test_acc']:.4f}")

    # perf telemetry (VERDICT r2 item 9): epoch wall includes the train
    # step dispatch AND the eval logits fetch (hard sync) — comparable
    # run-to-run, surfaces model-layer perf regressions outside bench.py
    n_ep = args.epochs + 1 - start_epoch
    if n_ep > 0:
        dt = (time.perf_counter() - t_epochs) / n_ep
        print(f"step_time_ms: {dt * 1e3:.1f} (train+eval wall per epoch, "
              f"{n_ep} epochs)")

    if args.save_pred:
        os.makedirs("./output", exist_ok=True)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(result["logits"])))
        if relabel is not None:  # save in original node order
            probs = np.concatenate([probs[relabel], probs[len(relabel):]], 0)
        np.save(f"./output/{args.kd_mode}_{iter_idx}.npy", probs)

    return result


def graph_valid(n_pad, data):
    v = np.zeros(n_pad, np.float32)
    v[: data.feat.shape[0]] = 1.0
    return v


def _np_soft_ce(logits, labels):
    z = logits - logits.max(-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    ce = -logp[np.arange(len(labels)), labels]
    return float(np.mean(np.log(ce + EPS) - np.log(EPS)))


def get_args(argv=None):
    p = argparse.ArgumentParser(
        "SIR-GCN/GATv2 implementation on ogbn-arxiv (TPU-native)",
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
    p.add_argument("--model", type=str, default="SIR",
                   choices=["SIR", "GAT"])
    p.add_argument("--nhidden", type=int, default=256)
    p.add_argument("--nlayers", type=int, default=1)
    p.add_argument("--input-dropout", type=float, default=0)
    p.add_argument("--edge-dropout", type=float, default=0)
    p.add_argument("--dropout", type=float, default=0)
    p.add_argument("--norm", type=str, default="none",
                   choices=["cn", "bn", "ln", "none"])
    p.add_argument("--readout-layers", type=int, default=1)
    p.add_argument("--readout-dropout", type=float, default=0)
    p.add_argument("--jumping-knowledge", action="store_true")
    p.add_argument("--residual", action="store_true")
    p.add_argument("--resid-layers", type=int, default=0)
    p.add_argument("--resid-dropout", type=float, default=0)
    p.add_argument("--feat-dropout", type=float, default=0)
    p.add_argument("--agg-type", type=str, default="mean",
                   choices=["sum", "max", "mean", "sym"])
    p.add_argument("--nheads", type=int, default=1)
    p.add_argument("--attn-dropout", type=float, default=0)
    p.add_argument("--add-self-loop", action="store_true")
    p.add_argument("--add-reverse-edge", action="store_true")
    p.add_argument("--use-xrt-emb", action="store_true")
    p.add_argument("--use-labels", action="store_true")
    p.add_argument("--label-iters", type=int, default=0)
    p.add_argument("--mask-rate", type=float, default=1)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--wd", type=float, default=0)
    p.add_argument("--l1", type=float, default=0)
    p.add_argument("--l2", type=float, default=0)
    p.add_argument("--factor", type=float, default=0.5)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--kd-mode", type=str, default="teacher",
                   choices=["teacher", "student"])
    p.add_argument("--kd-alpha", type=float, default=0.5)
    p.add_argument("--kd-temp", type=float, default=1)
    p.add_argument("--flag", action="store_true")
    p.add_argument("--m", type=int, default=5)
    p.add_argument("--train-step-size", type=float, default=1e-5)
    p.add_argument("--untrain-step-size", type=float, default=1e-5)
    p.add_argument("--nruns", type=int, default=10)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--save-pred", action="store_true")
    p.add_argument("--ckpt-dir", type=str, default="",
                   help="checkpoint directory (orbax; per-run subdirs); "
                        "empty = no checkpointing")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="save a checkpoint every N epochs (0 = never)")
    p.add_argument("--resume", action="store_true",
                   help="resume each run from its latest checkpoint "
                        "(bitwise-exact continuation)")
    p.add_argument("--no-fast-path", action="store_true",
                   help="disable the ELL fast path (debugging)")
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="edge-partition the full graph over this many "
                        "devices on a 'graph' mesh axis (SURVEY §2c P2); "
                        "0/1 = single device")
    p.add_argument("--dist-path", type=str, default="halo",
                   choices=["halo", "gspmd"],
                   help="multi-device path: boundary-only halo exchange "
                        "fast path, or GSPMD-partitioned CSR")
    p.add_argument("--reorder", action="store_true",
                   help="RCM-relabel nodes for src-gather locality "
                        "(TPU perf; training is equivariant)")
    p.add_argument("--remat", action="store_true",
                   help="activation checkpointing in the fast path "
                        "(recompute slot gathers in backward; ~ExH less "
                        "live memory per layer, numerics identical)")
    # synthetic fallback controls (no reference analog; zero-egress env)
    p.add_argument("--synthetic-nodes", type=int, default=4096)
    p.add_argument("--synthetic-edges", type=int, default=32768)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from sir_gcn_tpu.utils import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: first-in-container compiles only
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.remat:
        from sir_gcn_tpu.ops import set_remat

        set_remat(True)
    if args.edge_bf16:
        from sir_gcn_tpu.ops import set_edge_dtype

        set_edge_dtype(jnp.bfloat16)

    val_accs, test_accs = [], []
    for i in range(args.nruns):
        data = load_node_classification(
            "ogbn-arxiv",
            synthetic_fallback=dict(
                num_nodes=args.synthetic_nodes,
                num_edges=args.synthetic_edges,
                feat_dim=128, num_classes=40,
            ),
            seed=args.seed + i,
        )
        if data.synthetic:
            print("[warn] no ogbn-arxiv cache; using synthetic stand-in "
                  "(not a parity number)")
        if args.use_xrt_emb:
            # GIANT-XRT embeddings replace the raw features
            # (reference train.py:48-50)
            data.feat = np.load(
                "dataset/ogbn_arxiv_xrt/X.all.xrt-emb.npy"
            ).astype(np.float32)
        result = run_single(args, args.seed + i, data, i)
        val_accs.append(result["val_acc"])
        test_accs.append(result["test_acc"])

    print(f"Runned {args.nruns} times")
    aggregate_runs("val accuracy", val_accs)
    aggregate_runs("test accuracy", test_accs)
    return val_accs, test_accs


if __name__ == "__main__":
    main()
