"""SIR-GCN convolution family (flax.linen, TPU-native).

Re-implements the math contract of the reference layer library
(``/root/reference/models/conv.py``) on top of the framework's fused
message-passing op — no mutable graph frames, no Python message callbacks at
runtime; everything is traced once per padding bucket and compiled by XLA.

Parity notes (each cites the reference):
  * ``linear_key`` has no bias (conv.py:37); ``linear_query`` bias is
    ``inner_bias``; ``linear_relation`` bias is ``outer_bias`` (conv.py:36-38).
  * Dropout is applied to eq/ek (and the edge projection) *before* message
    formation (conv.py:60-61, 126-128).
  * Linearity hoist: W_R per node after aggregation for sum/mean/sym
    (conv.py:63-65); W_R per edge before the reduce for max (conv.py:47).
  * sym = sum with s_vu = out_deg(v)^-1/2 in_deg(u)^-1/2, degrees clamped
    >= 1 (conv.py:51-57).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import message_passing as mp
from .layers import Linear, torch_kernel_init

Activation = Callable[[jax.Array], jax.Array]

FeatLike = "jax.Array | tuple[jax.Array, jax.Array]"


def expand_as_pair(feat):
    """Reference ``expand_as_pair`` (``models/conv.py:4,59``): a single
    feature array is used for both endpoints; a ``(feat_src, feat_dst)``
    tuple feeds the key side from src features and the query side from dst
    features (bipartite layer contract, declared by all four conv
    classes)."""
    if isinstance(feat, (tuple, list)):
        feat_src, feat_dst = feat
        return feat_src, feat_dst
    return feat, feat


def _relation_params(module: nn.Module, hidden_dim: int, output_dim: int,
                     use_bias: bool):
    """Declare W_R explicitly for the max path so the per-edge matmul
    (conv.py:47) can be handed to the fused kernel as a plain array."""
    w = module.param(
        "relation_kernel", torch_kernel_init, (hidden_dim, output_dim)
    )
    if use_bias:
        bound = 1.0 / float(hidden_dim) ** 0.5
        b = module.param(
            "relation_bias",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -bound, bound
            ),
            (output_dim,),
        )
    else:
        b = None
    return w, b


class SIRConv(nn.Module):
    r"""h*_u = agg_{v in N(u)} W_R sigma(W_Q h_u + W_K h_v)

    (reference ``models/conv.py:7-67``)
    """

    hidden_dim: int
    output_dim: int
    activation: Activation
    dropout: float = 0.0
    inner_bias: bool = True
    outer_bias: bool = True
    agg_type: str = "sum"

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        feat,
        *,
        edge_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        feat_src, feat_dst = expand_as_pair(feat)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        eq = drop(Linear(self.hidden_dim, use_bias=self.inner_bias,
                         name="linear_query")(feat_dst))
        ek = drop(Linear(self.hidden_dim, use_bias=False,
                         name="linear_key")(feat_src))
        if self.agg_type == "max":
            w, b = _relation_params(
                self, self.hidden_dim, self.output_dim, self.outer_bias
            )
            return mp.sir_aggregate(
                graph, eq, ek, self.activation, "max",
                w_relation=w, b_relation=b, edge_mask=edge_mask,
            )

        agg = mp.sir_aggregate(
            graph, eq, ek, self.activation, self.agg_type,
            edge_mask=edge_mask,
        )
        return Linear(self.output_dim, use_bias=self.outer_bias,
                      name="linear_relation")(agg)


class SIREConv(nn.Module):
    r"""h*_u = agg_{v in N(u)} W_R sigma(W_Q h_u + W_E h_uv + W_K h_v)

    (reference ``models/conv.py:70-134``). ``efeat`` is given in original
    edge order; the layer permutes it into sorted order internally.
    """

    hidden_dim: int
    output_dim: int
    activation: Activation
    dropout: float = 0.0
    inner_bias: bool = True
    outer_bias: bool = True
    agg_type: str = "sum"
    edge_encoder: Optional[Callable[[jax.Array], jax.Array]] = None
    # edge_encoder overrides the default Linear W_E — used by ZINC's
    # SIREConv2 which swaps linear_edge for an Embedding of discrete bond
    # types (benchmark-datasets/zinc/model.py:12-15).

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        nfeat,
        efeat: jax.Array,
        *,
        edge_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        feat_src, feat_dst = expand_as_pair(nfeat)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        eq = drop(Linear(self.hidden_dim, use_bias=self.inner_bias,
                         name="linear_query")(feat_dst))
        ek = drop(Linear(self.hidden_dim, use_bias=False,
                         name="linear_key")(feat_src))

        # Fused-edge route: with the default Linear W_E and no active
        # edge dropout, hand sir_aggregate the RAW features + W_E so the
        # TPU fast path can fold the projection into the kernels and
        # never materialize the [E_pad, H] projection/cotangent (exact
        # same math; pulling W_E through the identity keeps the param
        # tree of the unfused Linear).
        edge_drop_off = self.dropout == 0.0 or deterministic
        if (self.edge_encoder is None and edge_drop_off
                and self.agg_type != "max" and efeat.ndim == 2):
            de = efeat.shape[-1]
            w_e = Linear(self.hidden_dim, use_bias=False,
                         name="linear_edge")(jnp.eye(de, dtype=efeat.dtype))
            e_basis = jnp.take(efeat, graph.edge_perm, axis=0)
            agg = mp.sir_aggregate(
                graph, eq, ek, self.activation, self.agg_type,
                e_basis=e_basis, w_edge=w_e, edge_mask=edge_mask,
            )
            return Linear(self.output_dim, use_bias=self.outer_bias,
                          name="linear_relation")(agg)

        if self.edge_encoder is not None:
            e = self.edge_encoder(efeat)
        else:
            e = Linear(self.hidden_dim, use_bias=False,
                       name="linear_edge")(efeat)
        e = drop(e)
        e = jnp.take(e, graph.edge_perm, axis=0)  # original -> sorted order

        if self.agg_type == "max":
            w, b = _relation_params(
                self, self.hidden_dim, self.output_dim, self.outer_bias
            )
            return mp.sir_aggregate(
                graph, eq, ek, self.activation, "max",
                e=e, w_relation=w, b_relation=b, edge_mask=edge_mask,
            )

        agg = mp.sir_aggregate(
            graph, eq, ek, self.activation, self.agg_type,
            e=e, edge_mask=edge_mask,
        )
        return Linear(self.output_dim, use_bias=self.outer_bias,
                      name="linear_relation")(agg)


class SIRConvBase(nn.Module):
    r"""Generic form h*_u = agg g([h_u || h_v]) for an arbitrary message
    module g (reference ``models/conv.py:137-177``). ``message_func`` is a
    jittable row-wise module (e.g. an ``MLP`` bound via ``nn.Module``)."""

    message_func: Callable[[jax.Array], jax.Array]
    agg_type: str = "sum"

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        feat,
        *,
        edge_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        feat_src, feat_dst = expand_as_pair(feat)
        return mp.sir_aggregate_concat(
            graph, feat_dst, feat_src, self.message_func, self.agg_type,
            edge_mask=edge_mask,
        )


class SIREConvBase(nn.Module):
    r"""Generic edge-feature form h*_u = agg g([h_u || h_v || h_uv])
    (reference ``models/conv.py:180-221``; the reference docstring writes
    [h_u || h_uv || h_v] but its message_func concatenates
    ``(edges.dst['eq'], edges.src['ek'], edges.data['e'])`` — conv.py:201 —
    and this class matches the CODE so message-MLP weights port
    column-for-column)."""

    message_func: Callable[[jax.Array], jax.Array]
    agg_type: str = "sum"

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        nfeat,
        efeat: jax.Array,
        *,
        edge_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        feat_src, feat_dst = expand_as_pair(nfeat)
        e = jnp.take(efeat, graph.edge_perm, axis=0)
        return mp.sir_aggregate_concat(
            graph, feat_dst, feat_src, self.message_func, self.agg_type,
            e=e, edge_mask=edge_mask,
        )
