"""sir_gcn_tpu — a TPU-native graph message-passing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference SIR-GCN research library (briangodwinlim/SIR-GCN): the SIR-GCN
layer family, normalization/utility zoo, nine training workloads, and a
static-shape graph runtime replacing DGL's C++/CUDA kernel layer — plus
multi-chip distribution (pjit/shard_map over device meshes) that the
reference does not have.
"""

from .ops.ell import FastGraph, build_fast_graph
from .graph import (
    GraphBatch,
    add_self_loops,
    bandwidth,
    batch_graphs,
    build_graph,
    drop_edge_mask,
    permute_nodes,
    rcm_order,
    remove_self_loops,
    reverse_edges,
    to_bidirected,
)

__version__ = "0.1.0"
