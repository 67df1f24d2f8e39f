"""OGB-compatible molecular feature encoders.

The reference uses ``ogb.graphproppred.mol_encoder.AtomEncoder/BondEncoder``
(``benchmark-datasets/ogbg-molhiv/model.py:7``): each categorical feature
column gets its own embedding table and the embeddings are summed. The
cardinalities below are OGB's published ``get_atom_feature_dims()`` /
``get_bond_feature_dims()`` for the mol datasets.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from .layers import Embed

ATOM_FEATURE_DIMS = (119, 5, 12, 12, 10, 6, 6, 2, 2)
BOND_FEATURE_DIMS = (5, 6, 2)


class AtomEncoder(nn.Module):
    embedding_dim: int

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        out = 0.0
        for i, card in enumerate(ATOM_FEATURE_DIMS):
            out = out + Embed(card, self.embedding_dim,
                              name=f"embedding_{i}")(feats[..., i])
        return out


class BondEncoder(nn.Module):
    embedding_dim: int

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        out = 0.0
        for i, card in enumerate(BOND_FEATURE_DIMS):
            out = out + Embed(card, self.embedding_dim,
                              name=f"embedding_{i}")(feats[..., i])
        return out
