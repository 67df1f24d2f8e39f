"""Edge-partitioned full-graph training (SURVEY §2c P2-P3).

The TPU analog of sequence/context parallelism for graphs: a single large
graph's node set is sharded in contiguous dst ranges over the ``graph`` mesh
axis. Because :class:`GraphBatch` stores edges sorted by dst, sharding the
edge arrays over the same axis gives each device (approximately) the
incoming edges of its node range — the owner-aggregates layout from
SURVEY §2c: local segment-sum needs no cross-device reduce; only src-side
features cross devices.

v1 strategy (this module): GSPMD — annotate shardings with
``NamedSharding`` and let XLA insert the all-gather of the (projected,
hidden-width) src features over ICI. The manual shard_map + ppermute halo
overlap is the planned v2 optimization.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import GraphBatch


def shard_full_graph(graph: GraphBatch, mesh: Mesh, axis: str = "graph"
                     ) -> GraphBatch:
    """Lay a GraphBatch out across the mesh: node-indexed arrays row-sharded
    over ``axis``, edge-indexed arrays sharded over ``axis`` (dst-sorted, so
    edge shards align with dst ownership), small/irregular arrays
    replicated."""
    n_shards = mesh.shape[axis]
    assert graph.n_pad % n_shards == 0, (
        f"n_pad {graph.n_pad} not divisible by {n_shards} shards; "
        f"build the graph with pad_multiple a multiple of the shard count"
    )
    node_sh = NamedSharding(mesh, P(axis))
    edge_sh = (NamedSharding(mesh, P(axis)) if graph.e_pad % n_shards == 0
               else NamedSharding(mesh, P()))
    rep = NamedSharding(mesh, P())

    put = jax.device_put
    return GraphBatch(
        src=put(graph.src, edge_sh),
        dst=put(graph.dst, edge_sh),
        edge_perm=put(graph.edge_perm, edge_sh),
        row_ptr=put(graph.row_ptr, rep),
        node_mask=put(graph.node_mask, node_sh),
        edge_mask=put(graph.edge_mask, edge_sh),
        graph_mask=put(graph.graph_mask, rep),
        node2graph=put(graph.node2graph, node_sh),
        num_nodes=put(graph.num_nodes, rep),
        num_edges=put(graph.num_edges, rep),
        num_graphs=put(graph.num_graphs, rep),
        in_deg=put(graph.in_deg, node_sh),
        out_deg=put(graph.out_deg, node_sh),
    )


def node_sharding(mesh: Mesh, axis: str = "graph") -> NamedSharding:
    """Sharding for [N_pad, ...] node feature arrays (row-sharded)."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
