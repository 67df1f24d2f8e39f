"""One-time dataset converters: DGL/OGB artifacts -> npz caches.

Run this anywhere DGL + OGB are installed (they are NOT runtime
dependencies of the TPU framework — SURVEY §7 "OGB/DGL dataset ingestion
without torch/DGL at runtime"); copy the resulting ``datasets/*.npz`` next
to the repo (or point ``SIR_GCN_DATA`` at them). Cache layouts are
documented in ``sir_gcn_tpu/data/loaders.py``.

    python tools/convert_datasets.py --out datasets ogbn-arxiv zinc ...
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def convert_ogbn_arxiv(out):
    from ogb.nodeproppred import DglNodePropPredDataset

    ds = DglNodePropPredDataset(name="ogbn-arxiv")
    graph, labels = ds[0]
    split = ds.get_idx_split()
    src, dst = graph.edges()
    np.savez_compressed(
        os.path.join(out, "ogbn_arxiv.npz"),
        src=src.numpy(), dst=dst.numpy(),
        feat=graph.ndata["feat"].numpy().astype(np.float32),
        labels=labels.numpy().ravel(),
        train_idx=split["train"].numpy(),
        val_idx=split["valid"].numpy(),
        test_idx=split["test"].numpy(),
    )


def convert_wiki_cs(out):
    from dgl.data import WikiCSDataset

    g = WikiCSDataset()[0]
    src, dst = g.edges()
    np.savez_compressed(
        os.path.join(out, "wiki_cs.npz"),
        src=src.numpy(), dst=dst.numpy(),
        feat=g.ndata["feat"].numpy().astype(np.float32),
        labels=g.ndata["label"].numpy(),
        train_masks=g.ndata["train_mask"].numpy().T.astype(bool),
        val_masks=g.ndata["val_mask"].numpy().T.astype(bool),
        stopping_masks=g.ndata["stopping_mask"].numpy().T.astype(bool),
        test_mask=g.ndata["test_mask"].numpy().astype(bool),
    )


def convert_heterophilous(out, name):
    import dgl.data as dd

    cls = {
        "roman-empire": dd.RomanEmpireDataset,
        "amazon-ratings": dd.AmazonRatingsDataset,
        "minesweeper": dd.MinesweeperDataset,
        "tolokers": dd.TolokersDataset,
        "questions": dd.QuestionsDataset,
    }[name]
    g = cls()[0]
    src, dst = g.edges()
    np.savez_compressed(
        os.path.join(out, f"{name.replace('-', '_')}.npz"),
        src=src.numpy(), dst=dst.numpy(),
        feat=g.ndata["feat"].numpy().astype(np.float32),
        labels=g.ndata["label"].numpy(),
        train_masks=g.ndata["train_mask"].numpy().T.astype(bool),
        val_masks=g.ndata["val_mask"].numpy().T.astype(bool),
        test_masks=g.ndata["test_mask"].numpy().T.astype(bool),
    )


def _pack_graph_dataset(items):
    """items: iterable of (graph, node_feat, edge_feat, label)."""
    offs_n, offs_e = [0], [0]
    srcs, dsts, nfs, efs, labels = [], [], [], [], []
    for g, nf, ef, y in items:
        s, d = g.edges()
        srcs.append(s.numpy())
        dsts.append(d.numpy())
        nfs.append(nf)
        efs.append(ef)
        labels.append(y)
        offs_n.append(offs_n[-1] + g.num_nodes())
        offs_e.append(offs_e[-1] + g.num_edges())
    return dict(
        src=np.concatenate(srcs), dst=np.concatenate(dsts),
        node_feat=np.concatenate(nfs), edge_feat=np.concatenate(efs),
        labels=np.asarray(labels),
        offsets_nodes=np.asarray(offs_n), offsets_edges=np.asarray(offs_e),
    )


def convert_zinc(out):
    from dgl.data import ZINCDataset

    packs, splits, start = [], {}, 0
    for mode in ("train", "valid", "test"):
        ds = ZINCDataset(mode=mode)
        items = [(g, g.ndata["feat"].numpy(), g.edata["feat"].numpy(),
                  float(y)) for g, y in ds]
        packs.extend(items)
        splits[mode] = np.arange(start, start + len(items))
        start += len(items)
    data = _pack_graph_dataset(packs)
    np.savez_compressed(
        os.path.join(out, "zinc.npz"), **data,
        train_idx=splits["train"], val_idx=splits["valid"],
        test_idx=splits["test"],
    )


def convert_ogbg_molhiv(out):
    from ogb.graphproppred import DglGraphPropPredDataset

    ds = DglGraphPropPredDataset(name="ogbg-molhiv")
    split = ds.get_idx_split()
    items = [(g, g.ndata["feat"].numpy(), g.edata["feat"].numpy(),
              float(y)) for g, y in ds]
    data = _pack_graph_dataset(items)
    np.savez_compressed(
        os.path.join(out, "ogbg_molhiv.npz"), **data,
        train_idx=split["train"].numpy(),
        val_idx=split["valid"].numpy(),
        test_idx=split["test"].numpy(),
    )


def convert_sbm(out, name):
    from dgl.data import CLUSTERDataset, PATTERNDataset

    cls = PATTERNDataset if name == "PATTERN" else CLUSTERDataset
    packs, node_labels, splits, start = [], [], {}, 0
    for mode in ("train", "valid", "test"):
        ds = cls(mode=mode)
        for g in ds:
            packs.append((g, g.ndata["feat"].numpy(),
                          np.zeros((g.num_edges(), 0), np.float32), 0.0))
            node_labels.append(g.ndata["label"].numpy())
        splits[mode] = np.arange(start, start + len(ds))
        start += len(ds)
    data = _pack_graph_dataset(packs)
    np.savez_compressed(
        os.path.join(out, f"sbm_{name.lower()}.npz"), **data,
        node_label=np.concatenate(node_labels),
        train_idx=splits["train"], val_idx=splits["valid"],
        test_idx=splits["test"],
    )


def convert_superpixel(out, name):
    from dgl.data import CIFAR10SuperPixelDataset, MNISTSuperPixelDataset

    cls = (MNISTSuperPixelDataset if name == "MNIST"
           else CIFAR10SuperPixelDataset)
    packs, labels, splits, start = [], [], {}, 0
    for mode in ("train", "test"):
        ds = cls(split=mode, use_feature=True)
        for g, y in ds:
            packs.append((g, g.ndata["feat"].numpy(),
                          g.edata["feat"].numpy(), float(y)))
        splits[mode] = np.arange(start, start + len(ds))
        start += len(ds)
    data = _pack_graph_dataset(packs)
    n_train = len(splits["train"])
    np.savez_compressed(
        os.path.join(out, f"superpixel_{name.lower()}.npz"), **data,
        # first 5000 of train held out as val (reference train.py:48-49)
        train_idx=splits["train"][5000:], val_idx=splits["train"][:5000],
        test_idx=splits["test"],
    )


CONVERTERS = {
    "ogbn-arxiv": convert_ogbn_arxiv,
    "wiki-cs": convert_wiki_cs,
    "zinc": convert_zinc,
    "ogbg-molhiv": convert_ogbg_molhiv,
    **{n: (lambda out, n=n: convert_heterophilous(out, n))
       for n in ("roman-empire", "amazon-ratings", "minesweeper",
                 "tolokers", "questions")},
    **{f"sbm-{n.lower()}": (lambda out, n=n: convert_sbm(out, n))
       for n in ("PATTERN", "CLUSTER")},
    **{f"superpixel-{n.lower()}":
       (lambda out, n=n: convert_superpixel(out, n))
       for n in ("MNIST", "CIFAR10")},
}


if __name__ == "__main__":
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("datasets", nargs="+", choices=list(CONVERTERS))
    p.add_argument("--out", default="datasets")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in args.datasets:
        print(f"converting {name} ...")
        CONVERTERS[name](args.out)
