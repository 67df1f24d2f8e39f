"""Graph readout pooling (reference uses ``dgl.nn.SumPooling`` /
``dgl.nn.AvgPooling``, e.g. ``benchmark-datasets/zinc/model.py:41``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph import GraphBatch


def sum_pool(graph: GraphBatch, feats: jax.Array) -> jax.Array:
    """Per-graph node sum -> [G_pad, ...]. Padding nodes excluded."""
    mask = graph.node_mask.reshape((-1,) + (1,) * (feats.ndim - 1))
    return jax.ops.segment_sum(
        jnp.where(mask, feats, 0.0), graph.node2graph, graph.g_pad
    )


def avg_pool(graph: GraphBatch, feats: jax.Array) -> jax.Array:
    """Per-graph node mean -> [G_pad, ...]."""
    s = sum_pool(graph, feats)
    n = jnp.maximum(graph.batch_num_nodes(), 1.0)
    return s / n.reshape((-1,) + (1,) * (s.ndim - 1))


def get_pool(name: str):
    if name in ("sum",):
        return sum_pool
    if name in ("mean", "avg"):
        return avg_pool
    raise NotImplementedError(f"pool = {name} not implemented")
