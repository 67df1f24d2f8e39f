"""Static-shape graph containers for TPU execution.

This is the TPU-native replacement for the reference's implicit DGL graph
runtime (``DGLGraph``, ``dgl.batch``, ``update_all`` plumbing — see
``/root/reference/models/conv.py:49-67`` for how the reference consumes it).

Design (not a DGL port):
  * A graph batch is an immutable pytree of fixed-shape arrays. All shapes are
    static per padding bucket, so XLA compiles each bucket exactly once.
  * Edges are stored in COO (``src``, ``dst``) **sorted by dst**; a CSR
    ``row_ptr`` over dst is carried for kernel-side segment addressing. Sorted
    order makes segment reductions deterministic, contiguous and atomics-free.
  * Padding nodes/edges are appended at the end and tracked by boolean masks.
    Padded edges point at the last padded node so sortedness is preserved.
  * Graph transforms (reverse / bidirect / self-loops) are host-side NumPy
    preprocessing; DropEdge is a runtime *mask*, never a shape change
    (reference resamples the graph per layer — ``models/utils.py:96-102`` —
    which we reproduce distributionally with per-layer random edge masks).
"""

from __future__ import annotations

import dataclasses
import weakref
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Host-side NumPy mirrors of GraphBatch structure arrays, keyed by object
# id (weakref-finalized). build_graph constructs everything on host first;
# keeping the mirrors lets plan builders (ops/ell.py) read structure
# without a device->host fetch — over the tunneled TPU runtime those
# fetches dominate plan-build wall time.
_HOST_MIRRORS: dict = {}


def _register_host_mirror(gb, arrays: dict) -> None:
    _HOST_MIRRORS[id(gb)] = arrays
    weakref.finalize(gb, _HOST_MIRRORS.pop, id(gb), None)


def host_array(gb, name: str) -> np.ndarray:
    """Host NumPy view of a GraphBatch structure array (``src``, ``dst``,
    ``edge_mask``, ``in_deg``, ``out_deg``, ...). Falls back to a device
    fetch for graphs not built via :func:`build_graph` (e.g. sliced or
    deserialized ones)."""
    m = _HOST_MIRRORS.get(id(gb))
    if m is not None and name in m:
        return m[name]
    return np.asarray(getattr(gb, name))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A (possibly batched) graph with static padded shapes.

    Attributes
    ----------
    src, dst : int32 [E_pad]
        COO endpoints, sorted by ``dst`` (ties broken by input order). Edges
        carry messages src -> dst, matching DGL's ``update_all`` direction.
    edge_perm : int32 [E_pad]
        Permutation mapping sorted-edge position -> original edge id, used to
        gather edge features supplied in the original edge order.
    row_ptr : int32 [N_pad + 1]
        CSR row pointers over ``dst`` (incoming-edge segments per node).
    node_mask : bool [N_pad]; edge_mask : bool [E_pad]; graph_mask : bool [G_pad]
        Validity masks for padding.
    node2graph : int32 [N_pad]
        Graph id of each node (padding nodes point at the last padded graph).
    num_nodes, num_edges, num_graphs : int32 scalars
        True (unpadded) counts.
    in_deg, out_deg : float32 [N_pad]
        True degrees (padding edges excluded; padding nodes have degree 0).
    """

    src: jax.Array
    dst: jax.Array
    edge_perm: jax.Array
    row_ptr: jax.Array
    node_mask: jax.Array
    edge_mask: jax.Array
    graph_mask: jax.Array
    node2graph: jax.Array
    num_nodes: jax.Array
    num_edges: jax.Array
    num_graphs: jax.Array
    in_deg: jax.Array
    out_deg: jax.Array

    # ---- static sizes -------------------------------------------------
    @property
    def n_pad(self) -> int:
        return self.node_mask.shape[0]

    @property
    def e_pad(self) -> int:
        return self.edge_mask.shape[0]

    @property
    def g_pad(self) -> int:
        return self.graph_mask.shape[0]

    # ---- derived quantities ------------------------------------------
    def in_degrees(self) -> jax.Array:
        return self.in_deg

    def out_degrees(self) -> jax.Array:
        return self.out_deg

    def batch_num_nodes(self) -> jax.Array:
        """Number of real nodes per graph, [G_pad] (0 for padded graphs)."""
        return jax.ops.segment_sum(
            self.node_mask.astype(jnp.float32), self.node2graph, self.g_pad
        )

    def broadcast_nodes(self, gfeat: jax.Array) -> jax.Array:
        """Graph-level -> node-level broadcast (``dgl.broadcast_nodes``,
        reference ``models/norm.py:17``)."""
        return jnp.take(gfeat, self.node2graph, axis=0)


# ======================================================================
# Host-side construction (NumPy)
# ======================================================================

def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    *,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    node2graph: Optional[np.ndarray] = None,
    num_graphs: int = 1,
    g_pad: Optional[int] = None,
    pad_multiple: int = 8,
) -> GraphBatch:
    """Build a :class:`GraphBatch` from a COO edge list (host side).

    Parameters mirror what ``dgl.graph((src, dst))`` captures, plus explicit
    padding targets so bucketed batching can pick shapes.
    """
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    num_edges = int(src.shape[0])
    if n_pad is None:
        n_pad = max(_round_up(max(num_nodes, 1), pad_multiple), pad_multiple)
    if e_pad is None:
        e_pad = max(_round_up(max(num_edges, 1), pad_multiple), pad_multiple)
    if g_pad is None:
        g_pad = num_graphs
    assert n_pad >= num_nodes and e_pad >= num_edges and g_pad >= num_graphs

    # Sort edges by dst (stable => deterministic tie order).
    order = np.argsort(dst, kind="stable").astype(np.int32)
    s_src = src[order]
    s_dst = dst[order]

    # Pad: padding edges target the last padded node (keeps dst sorted as long
    # as that node id >= every real dst, true because n_pad-1 >= num_nodes-1).
    pad_e = e_pad - num_edges
    pad_node = n_pad - 1
    p_src = np.concatenate([s_src, np.full(pad_e, pad_node, np.int32)])
    p_dst = np.concatenate([s_dst, np.full(pad_e, pad_node, np.int32)])
    p_perm = np.concatenate([order, np.zeros(pad_e, np.int32)])

    # CSR row_ptr over padded dst.
    counts = np.bincount(p_dst, minlength=n_pad)
    row_ptr = np.zeros(n_pad + 1, np.int32)
    np.cumsum(counts, out=row_ptr[1:])

    node_mask = np.arange(n_pad) < num_nodes
    edge_mask = np.arange(e_pad) < num_edges
    graph_mask = np.arange(g_pad) < num_graphs

    if node2graph is None:
        n2g = np.zeros(n_pad, np.int32)
        n2g[~node_mask] = g_pad - 1
    else:
        n2g = np.full(n_pad, g_pad - 1, np.int32)
        n2g[:num_nodes] = np.asarray(node2graph, dtype=np.int32)[:num_nodes]

    in_deg = np.bincount(s_dst, minlength=n_pad).astype(np.float32)
    out_deg = np.bincount(s_src, minlength=n_pad).astype(np.float32)
    in_deg[~node_mask] = 0.0
    out_deg[~node_mask] = 0.0

    gb = GraphBatch(
        src=jnp.asarray(p_src),
        dst=jnp.asarray(p_dst),
        edge_perm=jnp.asarray(p_perm),
        row_ptr=jnp.asarray(row_ptr),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        graph_mask=jnp.asarray(graph_mask),
        node2graph=jnp.asarray(n2g),
        num_nodes=jnp.asarray(num_nodes, jnp.int32),
        num_edges=jnp.asarray(num_edges, jnp.int32),
        num_graphs=jnp.asarray(num_graphs, jnp.int32),
        in_deg=jnp.asarray(in_deg),
        out_deg=jnp.asarray(out_deg),
    )
    _register_host_mirror(gb, dict(
        src=p_src, dst=p_dst, edge_perm=p_perm, edge_mask=edge_mask,
        node_mask=node_mask, in_deg=in_deg, out_deg=out_deg,
        node2graph=n2g, row_ptr=row_ptr))
    return gb


def batch_graphs(
    graphs: list[tuple[np.ndarray, np.ndarray, int]],
    *,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    g_pad: Optional[int] = None,
    pad_multiple: int = 8,
) -> GraphBatch:
    """Disjoint union of ``(src, dst, num_nodes)`` triples into one
    :class:`GraphBatch` (the TPU-native ``dgl.batch`` / GraphDataLoader
    collate — reference ``benchmark-datasets/zinc/train.py:42-44``)."""
    num_graphs = len(graphs)
    srcs, dsts, n2g = [], [], []
    offset = 0
    for gid, (s, d, n) in enumerate(graphs):
        srcs.append(np.asarray(s, np.int64) + offset)
        dsts.append(np.asarray(d, np.int64) + offset)
        n2g.append(np.full(n, gid, np.int32))
        offset += n
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
    node2graph = np.concatenate(n2g) if n2g else np.zeros(0, np.int32)
    return build_graph(
        src,
        dst,
        offset,
        n_pad=n_pad,
        e_pad=e_pad,
        node2graph=node2graph,
        num_graphs=num_graphs,
        g_pad=g_pad if g_pad is not None else num_graphs + 1,
        pad_multiple=pad_multiple,
    )


# ======================================================================
# Host-side graph transforms (NumPy; reference: dgl.reverse/to_bidirected/
# add_self_loop/remove_self_loop at benchmark-datasets/ogbn-arxiv/train.py:42-55)
# ======================================================================

def reverse_edges(src: np.ndarray, dst: np.ndarray):
    return np.asarray(dst), np.asarray(src)


def to_bidirected(src: np.ndarray, dst: np.ndarray):
    """Union of edges and reversed edges, deduplicated (dgl.to_bidirected)."""
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    key = s * (max(int(s.max(initial=0)), int(d.max(initial=0))) + 1) + d
    _, idx = np.unique(key, return_index=True)
    idx.sort()
    return s[idx], d[idx]


def remove_self_loops(src: np.ndarray, dst: np.ndarray):
    keep = src != dst
    return src[keep], dst[keep]


def add_self_loops(src: np.ndarray, dst: np.ndarray, num_nodes: int):
    loop = np.arange(num_nodes, dtype=src.dtype if src.size else np.int64)
    return np.concatenate([src, loop]), np.concatenate([dst, loop])


# ======================================================================
# Host-side locality reordering (gather-bandwidth optimization)
# ======================================================================

def rcm_order(src: np.ndarray, dst: np.ndarray, num_nodes: int
              ) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the undirected support graph.

    Returns ``perm`` with ``perm[new_id] = old_id``. Relabeling nodes by
    RCM concentrates each node's neighbors into a narrow id band, which
    turns the fast path's random src-row gathers into near-sequential HBM
    reads (ROADMAP: the dominant remaining cost at arxiv scale). The
    reference has no analog — DGL's CUDA gather is latency-hiding enough
    not to care; a TPU framework must care (no wide vector gather).

    Pure host-side preprocessing: apply with :func:`permute_nodes` before
    :func:`build_graph`; the trained model is equivalent up to the node
    relabeling (undo with the returned inverse).
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        a = coo_matrix(
            (np.ones(2 * len(src), np.int8),
             (np.concatenate([src, dst]), np.concatenate([dst, src]))),
            shape=(num_nodes, num_nodes)).tocsr()
        return np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True),
                          np.int64)
    except ImportError:
        return _rcm_numpy(src, dst, num_nodes)


def _rcm_numpy(src: np.ndarray, dst: np.ndarray, num_nodes: int
               ) -> np.ndarray:
    """Pure-NumPy RCM fallback: BFS from a minimum-degree node of each
    component, neighbors visited in increasing-degree order, then the
    whole order reversed."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    deg = np.bincount(s, minlength=num_nodes)
    ptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(deg, out=ptr[1:])

    visited = np.zeros(num_nodes, bool)
    out = np.empty(num_nodes, np.int64)
    pos = 0
    by_deg = np.argsort(deg, kind="stable")
    for seed in by_deg:
        if visited[seed]:
            continue
        visited[seed] = True
        out[pos] = seed
        head = pos
        pos += 1
        while head < pos:
            u = out[head]
            head += 1
            nbr = d[ptr[u]:ptr[u + 1]]
            nbr = nbr[~visited[nbr]]
            if nbr.size:
                nbr = np.unique(nbr)
                nbr = nbr[np.argsort(deg[nbr], kind="stable")]
                visited[nbr] = True
                out[pos:pos + nbr.size] = nbr
                pos += nbr.size
    return out[::-1].copy()


def permute_nodes(src: np.ndarray, dst: np.ndarray, perm: np.ndarray):
    """Relabel endpoints under ``perm`` (``perm[new_id] = old_id``).

    Returns ``(new_src, new_dst, relabel)`` where ``relabel[old] = new``;
    node-indexed data arrays move as ``x_new = x_old[perm]`` and results
    map back as ``y_old = y_new[relabel]``."""
    perm = np.asarray(perm, np.int64)
    relabel = np.empty_like(perm)
    relabel[perm] = np.arange(len(perm))
    return (relabel[np.asarray(src, np.int64)],
            relabel[np.asarray(dst, np.int64)], relabel)


def bandwidth(src: np.ndarray, dst: np.ndarray) -> float:
    """Mean |src - dst| id distance — the locality figure RCM minimizes."""
    if len(src) == 0:
        return 0.0
    return float(np.mean(np.abs(np.asarray(src, np.int64)
                                - np.asarray(dst, np.int64))))


# ======================================================================
# Runtime DropEdge mask (device side)
# ======================================================================

def drop_edge_mask(
    rng: jax.Array, graph: GraphBatch, rate: float
) -> jax.Array:
    """Bernoulli keep-mask over edges; replaces DGL's shape-changing
    ``DropEdge`` subgraph resampling (reference ``models/utils.py:96-102``)
    with a static-shape mask drawn fresh per layer per step."""
    if rate <= 0.0:
        return graph.edge_mask
    keep = jax.random.bernoulli(rng, 1.0 - rate, (graph.e_pad,))
    return jnp.logical_and(keep, graph.edge_mask)
