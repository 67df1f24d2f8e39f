"""Static-shape batched-graph data loading.

TPU-native replacement for ``dgl.dataloading.GraphDataLoader`` + ``dgl.batch``
collate (reference ``benchmark-datasets/zinc/train.py:42-44``): every batch is
a disjoint union padded to ONE fixed (n_pad, e_pad, g_pad) bucket computed
from the dataset's worst case, so XLA compiles the train step exactly once.
Partial final batches are padded with empty graphs and masked via per-graph
weights.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from ..graph import GraphBatch, batch_graphs


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class GraphCollection:
    """A dataset of variable-size graphs with per-node (and optionally
    per-edge) features and per-graph labels, served as fixed-bucket batches.

    Parameters
    ----------
    graphs : list of (src, dst, num_nodes)
    node_feats : list of [n_i, ...] arrays (or None)
    edge_feats : list of [e_i, ...] arrays (or None)
    labels : [S, ...] per-graph labels (or per-node: list of [n_i, ...])
    """

    def __init__(
        self,
        graphs: Sequence[tuple],
        node_feats: Optional[Sequence[np.ndarray]] = None,
        edge_feats: Optional[Sequence[np.ndarray]] = None,
        labels: Optional[np.ndarray] = None,
        node_labels: Optional[Sequence[np.ndarray]] = None,
    ):
        self.graphs = list(graphs)
        self.node_feats = node_feats
        self.edge_feats = edge_feats
        self.labels = labels
        self.node_labels = node_labels
        self.max_nodes = max(g[2] for g in self.graphs)
        self.max_edges = max(len(g[0]) for g in self.graphs)

    def __len__(self):
        return len(self.graphs)

    def bucket_shape(self, batch_size: int, pad_multiple: int = 8):
        n_pad = _round_up(batch_size * self.max_nodes + 1, pad_multiple)
        e_pad = _round_up(max(batch_size * self.max_edges, 1), pad_multiple)
        return n_pad, e_pad, batch_size + 1

    def collate(self, idx: np.ndarray, batch_size: int):
        """Build one padded batch from sample indices (len(idx) may be <
        batch_size for the final partial batch)."""
        n_pad, e_pad, g_pad = self.bucket_shape(batch_size)
        gs = [self.graphs[i] for i in idx]
        gb = batch_graphs(gs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad)

        out = {"graph": gb}
        if self.node_feats is not None:
            nf = np.concatenate([self.node_feats[i] for i in idx])
            pad = np.zeros((n_pad - nf.shape[0],) + nf.shape[1:], nf.dtype)
            out["node_feats"] = np.concatenate([nf, pad])
        if self.edge_feats is not None:
            ef = np.concatenate([self.edge_feats[i] for i in idx])
            pad = np.zeros((e_pad - ef.shape[0],) + ef.shape[1:], ef.dtype)
            out["edge_feats"] = np.concatenate([ef, pad])
        if self.labels is not None:
            lab = np.asarray(self.labels)[idx]
            pad = np.zeros((g_pad - lab.shape[0],) + lab.shape[1:], lab.dtype)
            out["labels"] = np.concatenate([lab, pad])
        if self.node_labels is not None:
            nl = np.concatenate([self.node_labels[i] for i in idx])
            pad = np.zeros((n_pad - nl.shape[0],) + nl.shape[1:], nl.dtype)
            out["node_labels"] = np.concatenate([nl, pad])
            nw = np.zeros(n_pad, np.float32)
            nw[: nl.shape[0]] = 1.0
            out["node_weights"] = nw
        w = np.zeros(g_pad, np.float32)
        w[: len(idx)] = 1.0
        out["graph_weights"] = w
        return out

    def loader(
        self,
        idx: np.ndarray,
        batch_size: int,
        shuffle_rng: Optional[np.random.Generator] = None,
        drop_last: bool = False,
    ) -> Iterator[dict]:
        order = np.asarray(idx)
        if shuffle_rng is not None:
            order = shuffle_rng.permutation(order)
        for s in range(0, len(order), batch_size):
            sel = order[s: s + batch_size]
            if drop_last and len(sel) < batch_size:
                break
            yield self.collate(sel, batch_size)
