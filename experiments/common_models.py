"""Shared batched-graph task-model skeleton.

The reference repeats the same architecture in ZINC / molhiv / SBM /
super-pixel ``model.py`` files (encoder -> N x [DropEdge, resid-MLP,
SIRConv, norm, LeakyReLU(0.2), dropout] -> jumping-knowledge readout MLPs
-> pooling; e.g. ``benchmark-datasets/zinc/model.py:18-61``). Here it is
one configurable module; per-experiment files instantiate it.
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Optional

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp

from sir_gcn_tpu.graph import GraphBatch, drop_edge_mask
from sir_gcn_tpu.models import MLP, Embed, Linear, SIRConv, SIREConv, get_norm
from sir_gcn_tpu.models.zoo import GATv2Conv, GINConv
from sir_gcn_tpu.ops.pool import get_pool


def leaky_relu02(x):
    return jax.nn.leaky_relu(x, 0.2)


class GraphSIRModel(nn.Module):
    """Batched-graph SIR model (reference zinc/model.py:18-61 and its
    siblings). ``encoder`` embeds raw node features; ``edge_encoder``
    (optional) activates the SIREConv2-style edge-feature path
    (zinc/model.py:12-15)."""

    encoder: Callable            # nn.Module factory: feats -> [N, hidden]
    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    input_dropout: float = 0.0
    edge_dropout: float = 0.0
    dropout: float = 0.0
    norm: str = "none"
    readout_layers: int = 1
    readout_dropout: float = 0.0
    readout_pooling: str = "sum"
    jumping_knowledge: bool = True
    residual: bool = False
    resid_layers: int = 0
    resid_dropout: float = 0.0
    feat_dropout: float = 0.0
    agg_type: str = "sum"
    edge_encoder: Optional[Callable] = None
    pool_after_readout: bool = True

    @nn.compact
    def __call__(self, graph: GraphBatch, nfeats, efeats=None, *,
                 deterministic: bool = True):
        act = leaky_relu02
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        x = nn.Dropout(self.input_dropout, deterministic=deterministic)(
            self.encoder(self, nfeats))

        xs = [x] if self.jumping_knowledge else []
        for i in range(self.num_layers):
            emask = None
            if self.edge_dropout > 0 and not deterministic:
                emask = drop_edge_mask(self.make_rng("dropout"), graph,
                                       self.edge_dropout)
            resid = 0.0
            if self.residual:
                resid = MLP(self.hidden_dim, self.hidden_dim,
                            self.hidden_dim, self.resid_layers,
                            self.resid_dropout, "none", act,
                            include_last=False, with_graph=False,
                            name=f"resid_{i}")(
                    x, deterministic=deterministic) \
                    if self.resid_layers > 0 else x

            if self.edge_encoder is not None:
                x = SIREConv(self.hidden_dim, self.hidden_dim, act,
                             self.feat_dropout, agg_type=self.agg_type,
                             edge_encoder=lambda e: self.edge_encoder(
                                 self, i, e),
                             name=f"conv_{i}")(
                    graph, x, efeats, edge_mask=emask,
                    deterministic=deterministic)
            else:
                x = SIRConv(self.hidden_dim, self.hidden_dim, act,
                            self.feat_dropout, agg_type=self.agg_type,
                            name=f"conv_{i}")(
                    graph, x, edge_mask=emask,
                    deterministic=deterministic)
            x = x + resid
            x = get_norm(self.norm, True, self.hidden_dim,
                         )(graph, x, deterministic=deterministic)
            x = act(x)
            x = drop(x)
            if self.jumping_knowledge:
                xs.append(x)

        heads = xs if self.jumping_knowledge else [x]
        score = sum(
            MLP(self.hidden_dim, self.hidden_dim, self.output_dim,
                self.readout_layers, self.readout_dropout, "none", act,
                include_last=False, with_graph=False,
                name=f"readout_{i}")(h, deterministic=deterministic)
            for i, h in enumerate(heads)
        )
        pool = get_pool(self.readout_pooling)
        if self.pool_after_readout:
            return pool(graph, score)
        return score


class GraphGINModel(nn.Module):
    """GIN baseline (reference zinc/model.py:64-106): GINConv with
    post-combine MLP, JK readouts, pooling."""

    encoder: Callable
    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    input_dropout: float = 0.0
    edge_dropout: float = 0.0
    dropout: float = 0.0
    norm: str = "none"
    readout_layers: int = 1
    readout_dropout: float = 0.0
    readout_pooling: str = "sum"
    jumping_knowledge: bool = True
    residual: bool = False
    resid_layers: int = 0
    resid_dropout: float = 0.0
    mlp_layers: int = 1
    agg_type: str = "sum"

    @nn.compact
    def __call__(self, graph: GraphBatch, nfeats, efeats=None, *,
                 deterministic: bool = True):
        act = leaky_relu02
        x = nn.Dropout(self.input_dropout, deterministic=deterministic)(
            self.encoder(self, nfeats))

        xs = [x] if self.jumping_knowledge else []
        for i in range(self.num_layers):
            emask = None
            if self.edge_dropout > 0 and not deterministic:
                emask = drop_edge_mask(self.make_rng("dropout"), graph,
                                       self.edge_dropout)
            resid = 0.0
            if self.residual:
                resid = MLP(self.hidden_dim, self.hidden_dim,
                            self.hidden_dim, self.resid_layers,
                            self.resid_dropout, "none", act,
                            include_last=False, with_graph=False,
                            name=f"resid_{i}")(
                    x, deterministic=deterministic) \
                    if self.resid_layers > 0 else x
            x = GINConv(apply_func=lambda h: h, agg=self.agg_type,
                        name=f"conv_{i}")(graph, x, edge_mask=emask)
            comb = MLP(self.hidden_dim, self.hidden_dim, self.hidden_dim,
                       self.mlp_layers, self.dropout, self.norm, act,
                       with_graph=True, name=f"comb_{i}")
            x = comb(graph, x, deterministic=deterministic) + resid
            if self.jumping_knowledge:
                xs.append(x)

        heads = xs if self.jumping_knowledge else [x]
        score = sum(
            MLP(self.hidden_dim, self.hidden_dim, self.output_dim,
                self.readout_layers, self.readout_dropout, "none", act,
                include_last=False, with_graph=False,
                name=f"readout_{i}")(h, deterministic=deterministic)
            for i, h in enumerate(heads)
        )
        return get_pool(self.readout_pooling)(graph, score)


class GraphGATModel(nn.Module):
    """GATv2 baseline on batched graphs (reference
    ``benchmark-datasets/sbm-dataset/model.py:55-92``): Embedding to
    heads*hidden -> N x [DropEdge, GATv2Conv(share_weights, bias=False,
    attn_drop, residual), flatten heads, norm, LeakyReLU(0.2), dropout]
    -> jumping-knowledge readout MLPs (node-level unless pooled)."""

    encoder: Callable
    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    input_dropout: float = 0.0
    edge_dropout: float = 0.0
    dropout: float = 0.0
    norm: str = "none"
    readout_layers: int = 1
    readout_dropout: float = 0.0
    readout_pooling: str = "sum"
    jumping_knowledge: bool = True
    residual: bool = False
    num_heads: int = 1
    attn_dropout: float = 0.0
    pool_after_readout: bool = True

    @nn.compact
    def __call__(self, graph: GraphBatch, nfeats, efeats=None, *,
                 deterministic: bool = True):
        act = leaky_relu02
        width = self.num_heads * self.hidden_dim
        x = nn.Dropout(self.input_dropout, deterministic=deterministic)(
            self.encoder(self, nfeats))

        xs = [x] if self.jumping_knowledge else []
        for i in range(self.num_layers):
            emask = None
            if self.edge_dropout > 0 and not deterministic:
                emask = drop_edge_mask(self.make_rng("dropout"), graph,
                                       self.edge_dropout)
            x = GATv2Conv(self.hidden_dim, self.num_heads,
                          share_weights=True, use_bias=False,
                          attn_dropout=self.attn_dropout,
                          residual=self.residual, name=f"conv_{i}")(
                graph, x, edge_mask=emask, deterministic=deterministic)
            x = x.reshape(x.shape[0], -1)
            x = get_norm(self.norm, True, width)(
                graph, x, deterministic=deterministic)
            x = act(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            if self.jumping_knowledge:
                xs.append(x)

        heads = xs if self.jumping_knowledge else [x]
        score = sum(
            MLP(width, self.hidden_dim, self.output_dim,
                self.readout_layers, self.readout_dropout, "none", act,
                include_last=False, with_graph=False,
                name=f"readout_{i}")(h, deterministic=deterministic)
            for i, h in enumerate(heads)
        )
        if self.pool_after_readout:
            return get_pool(self.readout_pooling)(graph, score)
        return score
