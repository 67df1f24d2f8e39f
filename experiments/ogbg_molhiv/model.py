"""ogbg-molhiv task models (reference
``benchmark-datasets/ogbg-molhiv/model.py``): AtomEncoder -> SIRConv stack
+ norm + LeakyReLU(0.2) (+identity residual) -> pooling -> 3-layer
EGC-style MLP readout [h, h/2, h/4, out] (model.py:50-86). The richer
commented variant's VirtualNode / CentralityEncoder / random-feature /
BondEncoder machinery (model.py:89-150) is exposed behind flags. GIN
baseline with GINEConv + BondEncoder + VirtualNode (model.py:153-212)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp

from sir_gcn_tpu.graph import GraphBatch
from sir_gcn_tpu.models import (
    MLP,
    CentralityEncoder,
    Linear,
    MaskedBatchNorm,
    SIRConv,
    SIREConv,
    VirtualNode,
    get_norm,
)
from sir_gcn_tpu.models.encoders import AtomEncoder, BondEncoder
from sir_gcn_tpu.models.zoo import GINEConv
from sir_gcn_tpu.ops.pool import avg_pool, get_pool, sum_pool


def leaky_relu02(x):
    return jax.nn.leaky_relu(x, 0.2)


class MLPEgc(nn.Module):
    """EGC-style MLP: BatchNorm+act+dropout between layers, plain final
    linear (reference molhiv model.py:13-46)."""

    layers: tuple
    dropout: float = 0.0

    @nn.compact
    def __call__(self, feats, mask=None, *, deterministic: bool = True):
        n = len(self.layers)
        for i, width in enumerate(self.layers):
            feats = Linear(width, name=f"linear_{i}")(feats)
            if i < n - 1:
                feats = MaskedBatchNorm(width, name=f"norm_{i}")(
                    feats, mask, deterministic=deterministic)
                feats = leaky_relu02(feats)
                feats = nn.Dropout(self.dropout,
                                   deterministic=deterministic)(feats)
        return feats


class SIRModel(nn.Module):
    """``readout_layers=0`` (default) keeps the active reference model's
    fixed EGC readout after pooling (model.py:70-71,86); >0 switches to
    the richer commented variant's per-node readout MLPs — with
    ``jumping_knowledge`` one summed readout per layer — pooled after
    (model.py:126-149). ``resid_layers>0`` replaces the identity residual
    with the richer variant's MLP residual (model.py:120)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    input_dropout: float = 0.0
    edge_dropout: float = 0.0
    dropout: float = 0.0
    norm: str = "none"
    readout_layers: int = 0
    readout_dropout: float = 0.0
    readout_pooling: str = "sum"
    jumping_knowledge: bool = False
    virtual_node: bool = False
    vn_layers: int = 0
    vn_dropout: float = 0.0
    vn_residual: bool = False
    rand_feat: bool = False
    max_degree: int = 0
    residual: bool = False
    resid_layers: int = 0
    resid_dropout: float = 0.0
    feat_dropout: float = 0.0
    agg_type: str = "sum"
    use_edge_feats: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, nfeats, efeats=None,
                 nfeats_perturb=0.0, *, deterministic: bool = True):
        act = leaky_relu02
        x = AtomEncoder(self.hidden_dim, name="embedding")(nfeats)
        x = x + nfeats_perturb
        if self.rand_feat and not deterministic:
            # commented variant model.py:118-120: random feature augmenting
            x = x + jax.random.uniform(self.make_rng("dropout"),
                                       x.shape, x.dtype, -1.0, 1.0)
        # reference commented variant: CentralityEncoder(..., 'in')
        # (model.py:105) — in-degree only
        x = CentralityEncoder(self.max_degree, self.hidden_dim,
                              direction="in", name="centrality")(graph, x)
        x = nn.Dropout(self.input_dropout,
                       deterministic=deterministic)(x)

        vn = VirtualNode(
            self.virtual_node, self.hidden_dim, self.vn_residual,
            mod_emb=MLP(self.hidden_dim, self.hidden_dim, self.hidden_dim,
                        self.vn_layers, self.vn_dropout, "none", act,
                        include_last=False, with_graph=True,
                        name="vn_mlp") if self.virtual_node else None,
            mod_pool=sum_pool, name="vn")
        vnfeat = None

        from sir_gcn_tpu.graph import drop_edge_mask

        xs = [x] if self.jumping_knowledge else []
        for i in range(self.num_layers):
            if self.virtual_node:
                x, vnfeat = vn.node_emb(graph, x, vnfeat,
                                        deterministic=deterministic)
            emask = None
            if self.edge_dropout > 0 and not deterministic:
                emask = drop_edge_mask(self.make_rng("dropout"), graph,
                                       self.edge_dropout)
            if self.resid_layers > 0 and self.residual:
                resid = MLP(self.hidden_dim, self.hidden_dim,
                            self.hidden_dim, self.resid_layers,
                            self.resid_dropout, "none", act,
                            include_last=False, with_graph=False,
                            name=f"resid_{i}")(
                    x, deterministic=deterministic)
            else:
                resid = x
            if self.use_edge_feats:
                x = SIREConv(
                    self.hidden_dim, self.hidden_dim, act,
                    self.feat_dropout, agg_type=self.agg_type,
                    edge_encoder=lambda e: BondEncoder(
                        self.hidden_dim, name=f"bond_{i}")(e),
                    name=f"conv_{i}")(
                    graph, x, efeats, edge_mask=emask,
                    deterministic=deterministic)
            else:
                x = SIRConv(self.hidden_dim, self.hidden_dim, act,
                            self.feat_dropout, agg_type=self.agg_type,
                            name=f"conv_{i}")(
                    graph, x, edge_mask=emask,
                    deterministic=deterministic)
            x = get_norm(self.norm, True, self.hidden_dim)(
                graph, x, deterministic=deterministic)
            x = act(x)
            if self.residual:
                x = x + resid
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            if self.jumping_knowledge:
                xs.append(x)
            if self.virtual_node and i < self.num_layers - 1:
                vnfeat = vn.vn_emb(graph, x, vnfeat,
                                   deterministic=deterministic)

        if self.readout_layers > 0:
            heads = xs if self.jumping_knowledge else [x]
            score = sum(
                MLP(self.hidden_dim, self.hidden_dim, self.output_dim,
                    self.readout_layers, self.readout_dropout, "none",
                    act, include_last=False, with_graph=False,
                    name=f"readout_{i}")(h, deterministic=deterministic)
                for i, h in enumerate(heads)
            )
            return get_pool(self.readout_pooling)(graph, score)
        pooled = get_pool(self.readout_pooling)(graph, x)
        h = self.hidden_dim
        return MLPEgc((h, h // 2, h // 4, self.output_dim)[1:],
                      name="readout")(
            pooled, graph.graph_mask, deterministic=deterministic)


class GINModel(nn.Module):
    """GIN baseline with GINEConv + BondEncoder + VirtualNode
    (reference model.py:153-212)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    input_dropout: float = 0.0
    dropout: float = 0.0
    norm: str = "bn"
    readout_pooling: str = "mean"
    virtual_node: bool = False
    vn_layers: int = 2
    vn_dropout: float = 0.0
    vn_residual: bool = False
    mlp_layers: int = 2

    @nn.compact
    def __call__(self, graph: GraphBatch, nfeats, efeats=None,
                 nfeats_perturb=0.0, *, deterministic: bool = True):
        act = leaky_relu02
        x = AtomEncoder(self.hidden_dim, name="embedding")(nfeats)
        x = x + nfeats_perturb
        x = nn.Dropout(self.input_dropout,
                       deterministic=deterministic)(x)

        vn = VirtualNode(
            self.virtual_node, self.hidden_dim, self.vn_residual,
            mod_emb=MLP(self.hidden_dim, self.hidden_dim, self.hidden_dim,
                        self.vn_layers, self.vn_dropout, "none", act,
                        include_last=False, with_graph=True,
                        name="vn_mlp") if self.virtual_node else None,
            mod_pool=sum_pool, name="vn")
        vnfeat = None

        for i in range(self.num_layers):
            if self.virtual_node:
                x, vnfeat = vn.node_emb(graph, x, vnfeat,
                                        deterministic=deterministic)
            mlp = MLP(self.hidden_dim, self.hidden_dim, self.hidden_dim,
                      self.mlp_layers, self.dropout, self.norm, act,
                      with_graph=True, name=f"mlp_{i}")
            bond = BondEncoder(self.hidden_dim, name=f"bond_{i}")
            x = GINEConv(apply_func=lambda h: h, name=f"conv_{i}")(
                graph, x, bond(efeats))
            x = mlp(graph, x, deterministic=deterministic)
            if self.virtual_node and i < self.num_layers - 1:
                vnfeat = vn.vn_emb(graph, x, vnfeat,
                                   deterministic=deterministic)

        pooled = get_pool(self.readout_pooling)(graph, x)
        return Linear(self.output_dim, name="readout")(pooled)
