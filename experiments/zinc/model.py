"""ZINC task models (reference ``benchmark-datasets/zinc/model.py``):
SIRModel with atom-type embedding encoder and GraphNorm-capable stack;
``use_edge_feats`` activates the SIREConv2 path (bond-type embedding as
W_E — model.py:12-15, wired-but-commented at model.py:37,53)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from experiments.common_models import GraphGINModel, GraphSIRModel
from sir_gcn_tpu.models import Embed


def make_sir_model(input_dim, edge_dim, hidden_dim, output_dim,
                   use_edge_feats=False, **kwargs):
    def encoder(mdl, feats):
        return Embed(input_dim, hidden_dim, name="node_encoder")(feats)

    edge_encoder = None
    if use_edge_feats:
        def edge_encoder(mdl, i, efeats):  # noqa: F811
            return Embed(edge_dim, hidden_dim,
                         name=f"edge_encoder_{i}")(efeats)

    return GraphSIRModel(
        encoder=encoder, edge_encoder=edge_encoder,
        hidden_dim=hidden_dim, output_dim=output_dim, **kwargs)


def make_gin_model(input_dim, edge_dim, hidden_dim, output_dim, **kwargs):
    def encoder(mdl, feats):
        return Embed(input_dim, hidden_dim, name="node_encoder")(feats)

    return GraphGINModel(encoder=encoder, hidden_dim=hidden_dim,
                         output_dim=output_dim, **kwargs)
