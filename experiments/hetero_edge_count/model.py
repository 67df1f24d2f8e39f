"""HeteroEdgeCount task models (reference
``synthetic-datasets/hetero-edge-count/model.py``). The SIR model applies the
regression head *before* SumPooling (model.py:32-34) — a deliberate
distinction from the baselines, which pool first (model.py:59-61)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sir_gcn_tpu.graph import GraphBatch
from sir_gcn_tpu.models import Embed, Linear, SIRConv
from sir_gcn_tpu.models.zoo import GATv2Conv, GraphConv
from sir_gcn_tpu.ops import sum_pool


class SIRModel(nn.Module):
    input_dim: int      # num_classes
    hidden_dim: int
    output_dim: int = 1
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph: GraphBatch, feats: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        x = Embed(self.input_dim, self.hidden_dim, name="embedding")(feats)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        for i in range(self.num_layers):
            x = SIRConv(self.hidden_dim, self.hidden_dim, jax.nn.relu,
                        name=f"conv_{i}")(graph, x,
                                          deterministic=deterministic)
            x = drop(x)
        x = Linear(self.output_dim, use_bias=False, name="regression")(x)
        return sum_pool(graph, x)


class _PoolBaseline(nn.Module):
    """Shared baseline skeleton: embed -> convs -> SumPool -> regression
    (reference model.py:37-169; pooling before the head, unlike SIR)."""

    input_dim: int
    hidden_dim: int
    output_dim: int = 1
    num_layers: int = 1
    dropout: float = 0.0
    num_heads: int = 1
    mlp_layers: int = 1

    def conv(self, i):
        raise NotImplementedError

    def post(self, x):
        return x

    @nn.compact
    def __call__(self, graph: GraphBatch, feats: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        x = Embed(self.input_dim, self.hidden_dim, name="embedding")(feats)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        for i in range(self.num_layers):
            x = self.post(self.conv(i)(graph, x))
            x = drop(x)
        x = sum_pool(graph, x)
        return Linear(self.output_dim, use_bias=False,
                      name="regression")(x)


class GCNModel(_PoolBaseline):
    """Baseline: pools first, regression after (model.py:52-61)."""

    def conv(self, i):
        return GraphConv(self.hidden_dim, name=f"conv_{i}")


class GATModel(_PoolBaseline):
    def conv(self, i):
        return GATv2Conv(self.hidden_dim, self.num_heads,
                         name=f"conv_{i}")

    def post(self, x):
        return x.mean(axis=1)


class SAGEModel(_PoolBaseline):
    def conv(self, i):
        from sir_gcn_tpu.models.zoo import SAGEConv

        return SAGEConv(self.hidden_dim, name=f"conv_{i}")


class GINModel(_PoolBaseline):
    def conv(self, i):
        from sir_gcn_tpu.models import MLP
        from sir_gcn_tpu.models.zoo import GINConv

        mlp = MLP(self.hidden_dim, self.hidden_dim, self.hidden_dim,
                  self.mlp_layers, 0.0, "none", jax.nn.relu,
                  include_last=True, with_graph=False, name=f"mlp_{i}")
        return GINConv(apply_func=lambda h: mlp(h), name=f"conv_{i}")


class PNAModel(_PoolBaseline):
    def conv(self, i):
        from sir_gcn_tpu.models.zoo import PNAConv

        return PNAConv(self.hidden_dim, name=f"conv_{i}")
