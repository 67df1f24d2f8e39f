"""DictionaryLookup task models (reference
``synthetic-datasets/dictionary-lookup/model.py``).

``SIRModel``: key+value embeddings summed, SIRConv stack with the paper's
MLP-augmented activation sigma = ReLU o Linear o ReLU (model.py:17 — the
"inductive bias for more complex (relational) reasoning"), shared across
layers, followed by a bias-free classifier.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sir_gcn_tpu.graph import GraphBatch
from sir_gcn_tpu.models import Embed, Linear, SIRConv


class SIRModel(nn.Module):
    input_dim: int          # n (number of keys)
    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph: GraphBatch, feats: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        x = (Embed(self.input_dim + 1, self.hidden_dim,
                   name="key_embedding")(feats[:, 0])
             + Embed(self.input_dim + 1, self.hidden_dim,
                     name="val_embedding")(feats[:, 1]))

        # shared MLP-augmented activation (one Linear reused by all layers,
        # matching the reference's single self.activation instance)
        act_dense = Linear(self.hidden_dim, name="activation_linear")

        def activation(z):
            return jax.nn.relu(act_dense(jax.nn.relu(z)))

        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        for i in range(self.num_layers):
            x = SIRConv(self.hidden_dim, self.hidden_dim,
                        activation, name=f"conv_{i}")(
                graph, x, deterministic=deterministic)
            x = drop(x)

        return Linear(self.output_dim, use_bias=False,
                      name="classifier")(x)


class _BaselineModel(nn.Module):
    """Shared baseline skeleton (reference model.py:38-170): key+val
    embeddings summed, ReLU, conv stack, bias-free classifier. Subclasses
    provide the conv. All sit at chance level on this task — the
    discriminative-power contrast SIR-GCN is sold on (README.md:50-74)."""

    input_dim: int
    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    dropout: float = 0.0
    num_heads: int = 1
    mlp_layers: int = 2

    def conv(self, i):
        raise NotImplementedError

    def post(self, x):
        return x

    @nn.compact
    def __call__(self, graph: GraphBatch, feats: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        x = (Embed(self.input_dim + 1, self.hidden_dim,
                   name="key_embedding")(feats[:, 0])
             + Embed(self.input_dim + 1, self.hidden_dim,
                     name="val_embedding")(feats[:, 1]))
        x = jax.nn.relu(x)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        for i in range(self.num_layers):
            x = self.post(self.conv(i)(graph, x))
            x = drop(x)
        return Linear(self.output_dim, use_bias=False,
                      name="classifier")(x)


class GCNModel(_BaselineModel):
    def conv(self, i):
        from sir_gcn_tpu.models.zoo import GraphConv

        return GraphConv(self.hidden_dim, name=f"conv_{i}")


class SAGEModel(_BaselineModel):
    def conv(self, i):
        from sir_gcn_tpu.models.zoo import SAGEConv

        return SAGEConv(self.hidden_dim, name=f"conv_{i}")


class GATModel(_BaselineModel):
    def conv(self, i):
        from sir_gcn_tpu.models.zoo import GATv2Conv

        return GATv2Conv(self.hidden_dim, self.num_heads,
                         name=f"conv_{i}")

    def post(self, x):
        return x.mean(axis=1)  # head-mean (reference model.py:112)


class GINModel(_BaselineModel):
    def conv(self, i):
        from sir_gcn_tpu.models import MLP
        from sir_gcn_tpu.models.zoo import GINConv

        mlp = MLP(self.hidden_dim, self.hidden_dim, self.hidden_dim,
                  self.mlp_layers, 0.0, "none", jax.nn.relu,
                  include_last=True, with_graph=False,
                  name=f"mlp_{i}")
        return GINConv(apply_func=lambda h: mlp(h), name=f"conv_{i}")


class PNAModel(_BaselineModel):
    def conv(self, i):
        from sir_gcn_tpu.models.zoo import PNAConv

        return PNAConv(self.hidden_dim, name=f"conv_{i}")
