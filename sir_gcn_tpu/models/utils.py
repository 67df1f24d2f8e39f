"""Shared model utilities (reference ``/root/reference/models/utils.py``):
MLP, VirtualNode, CentralityEncoder. (DropEdge lives in
``sir_gcn_tpu.graph.drop_edge_mask`` as a static-shape mask op.)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops.pool import sum_pool
from .layers import Embed, Linear
from .norm import get_norm


class MLP(nn.Module):
    """N-layer MLP with per-layer norm + activation and trailing dropout
    (reference ``models/utils.py:7-43``). ``include_last=False`` skips
    norm+activation on the final layer. ``with_graph`` selects the
    (graph, feats) call signature and graph-aware norms."""

    input_dim: int
    hidden_dim: int
    output_dim: int
    num_layers: int
    dropout: float = 0.0
    norm: str = "none"
    activation: Callable[[jax.Array], jax.Array] = jax.nn.relu
    include_last: bool = True
    with_graph: bool = True
    norm_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, *args, deterministic: bool = True) -> jax.Array:
        if self.with_graph:
            graph, feats = args
        else:
            (feats,) = args
            graph = None

        kw = self.norm_kwargs or {}
        for i in range(self.num_layers):
            out_dim = (self.hidden_dim if i < self.num_layers - 1
                       else self.output_dim)
            feats = Linear(out_dim, name=f"linear_{i}")(feats)
            if i < self.num_layers - 1 or self.include_last:
                norm = get_norm(self.norm, self.with_graph, out_dim, **kw)
                if self.with_graph:
                    feats = norm(graph, feats, deterministic=deterministic)
                else:
                    feats = norm(feats, deterministic=deterministic)
                feats = self.activation(feats)

        return nn.Dropout(self.dropout, deterministic=deterministic)(feats)


class VirtualNode(nn.Module):
    """Virtual-node hooks used around each conv layer (reference
    ``models/utils.py:46-67``):

      * :meth:`node_emb` broadcasts the current VN embedding to each graph's
        nodes (initialized from a 1-row embedding table);
      * :meth:`vn_emb` pools the nodes, adds the previous VN state, transforms
        through ``mod_emb``, with optional residual.

    Both are no-ops when ``use_vn=False``.
    """

    use_vn: bool
    hidden_dim: int
    residual: bool
    mod_emb: Optional[nn.Module] = None
    mod_pool: Callable[[GraphBatch, jax.Array], jax.Array] = sum_pool

    def setup(self):
        if self.use_vn:
            self.init_emb = Embed(1, self.hidden_dim, name="init_emb")

    def node_emb(self, graph: GraphBatch, nfeats, vnfeat=None,
                 *, deterministic: bool = True):
        if not self.use_vn:
            return nfeats, vnfeat
        if vnfeat is None:
            vnfeat = self.init_emb(jnp.zeros((graph.g_pad,), jnp.int32))
        nfeats = nfeats + graph.broadcast_nodes(vnfeat)
        return nfeats, vnfeat

    def vn_emb(self, graph: GraphBatch, nfeats, vnfeat,
               *, deterministic: bool = True):
        if not self.use_vn:
            return vnfeat
        pooled = self.mod_pool(graph, nfeats) + vnfeat
        out = self.mod_emb(graph, pooled, deterministic=deterministic)
        return out + vnfeat if self.residual else out

    def __call__(self, graph: GraphBatch, nfeats, vnfeat=None,
                 *, deterministic: bool = True):
        # convenience: one full hook cycle (init params in one pass)
        nfeats, vnfeat = self.node_emb(
            graph, nfeats, vnfeat, deterministic=deterministic
        )
        vnfeat = self.vn_emb(graph, nfeats, vnfeat,
                             deterministic=deterministic)
        return nfeats, vnfeat


class CentralityEncoder(nn.Module):
    """Graphormer-style degree encoding added to node features (reference
    ``models/utils.py:70-93``): embeddings of in-/out-degree clamped to
    ``max_degree``, padding_idx 0. Identity when ``max_degree == 0``."""

    max_degree: int
    embedding_dim: int
    direction: str = "both"

    @nn.compact
    def __call__(self, graph: GraphBatch, nfeats: jax.Array) -> jax.Array:
        if self.max_degree == 0:
            return nfeats
        in_deg = jnp.clip(graph.in_deg.astype(jnp.int32), 0, self.max_degree)
        out_deg = jnp.clip(graph.out_deg.astype(jnp.int32), 0, self.max_degree)
        if self.direction in ("in", "both"):
            nfeats = nfeats + Embed(
                self.max_degree + 1, self.embedding_dim,
                padding_idx=0, name="encoder_in",
            )(in_deg)
        if self.direction in ("out", "both"):
            nfeats = nfeats + Embed(
                self.max_degree + 1, self.embedding_dim,
                padding_idx=0, name="encoder_out",
            )(out_deg)
        return nfeats
