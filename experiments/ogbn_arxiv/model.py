"""ogbn-arxiv task models (reference
``benchmark-datasets/ogbn-arxiv/model.py``): the EGC-style SIRModel
(model.py:42-75) with the optional richer machinery of the commented variant
(model.py:78-116 — input dropout, per-layer edge dropout, jumping-knowledge
readouts, MLP residuals) exposed behind the same flags the CLI offers.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sir_gcn_tpu.graph import GraphBatch, drop_edge_mask
from sir_gcn_tpu.models import MLP, Linear, SIRConv, get_norm
from sir_gcn_tpu.models.zoo import GATv2Conv


def leaky_relu02(x):
    return jax.nn.leaky_relu(x, 0.2)


class SIRModel(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    input_dropout: float = 0.0
    edge_dropout: float = 0.0
    dropout: float = 0.0
    norm: str = "none"
    readout_layers: int = 1
    readout_dropout: float = 0.0
    jumping_knowledge: bool = False
    residual: bool = False
    resid_layers: int = 0
    resid_dropout: float = 0.0
    feat_dropout: float = 0.0
    agg_type: str = "mean"

    @nn.compact
    def __call__(self, graph: GraphBatch, feats: jax.Array,
                 perturb: jax.Array | float = 0.0, *,
                 deterministic: bool = True) -> jax.Array:
        act = leaky_relu02
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        in_drop = nn.Dropout(self.input_dropout, deterministic=deterministic)
        input_dim = feats.shape[-1]

        feats = in_drop(feats) + perturb
        # EGC-style embedding MLP ([input, hidden] => single linear;
        # model.py:51)
        x = Linear(self.hidden_dim, name="embedding")(feats)

        feats_list = [feats] if self.jumping_knowledge else []
        for i in range(self.num_layers):
            if self.edge_dropout > 0 and not deterministic:
                emask = drop_edge_mask(
                    self.make_rng("dropout"), graph, self.edge_dropout
                )
            else:
                emask = None
            if self.residual and self.resid_layers > 0:
                resid = MLP(self.hidden_dim, self.hidden_dim,
                            self.hidden_dim, self.resid_layers,
                            self.resid_dropout, "none", act,
                            include_last=False, with_graph=False,
                            name=f"resid_{i}")(
                    x, deterministic=deterministic)
            elif self.residual:
                resid = x
            else:
                resid = 0.0

            x = SIRConv(self.hidden_dim, self.hidden_dim, act,
                        self.feat_dropout, agg_type=self.agg_type,
                        name=f"conv_{i}")(
                graph, x, edge_mask=emask, deterministic=deterministic)
            norm = get_norm(self.norm, True, self.hidden_dim)
            x = norm(graph, x, deterministic=deterministic)
            x = act(x)
            x = drop(x)
            if self.residual:
                x = x + resid
            if self.jumping_knowledge:
                feats_list.append(x)

        if self.jumping_knowledge:
            outs = []
            for i, f in enumerate(feats_list):
                outs.append(MLP(f.shape[-1], self.hidden_dim,
                                self.output_dim, self.readout_layers,
                                self.readout_dropout, "none", act,
                                include_last=False, with_graph=False,
                                name=f"readout_{i}")(
                    f, deterministic=deterministic))
            return sum(outs)
        return Linear(self.output_dim, name="readout")(x)


class GATModel(nn.Module):
    """GATv2 baseline with jumping knowledge (model.py:119-155)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    input_dropout: float = 0.0
    edge_dropout: float = 0.0
    dropout: float = 0.0
    norm: str = "none"
    readout_layers: int = 1
    readout_dropout: float = 0.0
    jumping_knowledge: bool = True
    num_heads: int = 1
    attn_dropout: float = 0.0
    residual: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, feats: jax.Array,
                 perturb: jax.Array | float = 0.0, *,
                 deterministic: bool = True) -> jax.Array:
        act = leaky_relu02
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        in_drop = nn.Dropout(self.input_dropout, deterministic=deterministic)

        x = in_drop(feats) + perturb
        feats_list = [x] if self.jumping_knowledge else []
        for i in range(self.num_layers):
            if self.edge_dropout > 0 and not deterministic:
                emask = drop_edge_mask(
                    self.make_rng("dropout"), graph, self.edge_dropout
                )
            else:
                emask = None
            x = GATv2Conv(self.hidden_dim, self.num_heads,
                          share_weights=False,
                          attn_dropout=self.attn_dropout,
                          residual=self.residual,
                          name=f"conv_{i}")(graph, x, edge_mask=emask,
                                            deterministic=deterministic)
            x = x.reshape(x.shape[0], -1)
            norm = get_norm(self.norm, True,
                            self.num_heads * self.hidden_dim)
            x = norm(graph, x, deterministic=deterministic)
            x = act(x)
            x = drop(x)
            if self.jumping_knowledge:
                feats_list.append(x)

        if self.jumping_knowledge:
            outs = []
            for i, f in enumerate(feats_list):
                outs.append(MLP(f.shape[-1], self.hidden_dim,
                                self.output_dim, self.readout_layers,
                                self.readout_dropout, "none", act,
                                include_last=False, with_graph=False,
                                name=f"readout_{i}")(
                    f, deterministic=deterministic))
            return sum(outs)
        return Linear(self.output_dim, name="readout")(x)
