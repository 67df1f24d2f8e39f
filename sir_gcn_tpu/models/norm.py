"""Normalization zoo (reference ``/root/reference/models/norm.py``).

All graph-aware norms are padding-mask-aware: statistics are computed over
real nodes only (the reference has no padding, so this is the static-shape
equivalent of its exact per-graph statistics).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch


class GraphNorm(nn.Module):
    """Per-graph normalization over batched graphs with a learnable mean
    scale (reference ``models/norm.py:7-29``): for each graph g,

        out = weight * (x - mean_g(x) * mean_scale) / sqrt(var + eps) + bias

    where mean/var are per-graph scatter statistics over that graph's nodes.
    """

    dim: int
    eps: float = 1e-5
    use_bias: bool = True
    use_mean_scale: bool = True

    @nn.compact
    def __call__(self, graph: GraphBatch, feats: jax.Array, **_: Any):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = (self.param("bias", nn.initializers.zeros, (self.dim,))
                if self.use_bias else 0.0)
        mean_scale = (self.param("mean_scale", nn.initializers.ones,
                                 (self.dim,))
                      if self.use_mean_scale else 1.0)

        g = graph.g_pad
        mask = graph.node_mask[:, None].astype(feats.dtype)
        n_per_graph = jnp.maximum(graph.batch_num_nodes(), 1.0)[:, None]

        tot = jax.ops.segment_sum(feats * mask, graph.node2graph, g)
        mean = tot / n_per_graph
        demean = feats - graph.broadcast_nodes(mean) * mean_scale

        var = jax.ops.segment_sum(
            jnp.square(demean) * mask, graph.node2graph, g
        ) / n_per_graph
        std = graph.broadcast_nodes(jnp.sqrt(var + self.eps))
        return weight * demean / std + bias


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over real rows only, with running statistics
    (reference uses ``nn.BatchNorm1d`` inside ContraNorm/GraphBatchNorm,
    ``models/norm.py:38,53``). Running stats live in the ``batch_stats``
    collection; momentum matches torch's default 0.1."""

    dim: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,
        mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = False,
    ):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.dim,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.dim,)))

        if deterministic:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                n = feats.shape[0]
                mean = jnp.mean(feats, axis=0)
                var = jnp.mean(jnp.square(feats - mean), axis=0)
            else:
                m = mask.astype(feats.dtype)[:, None]
                n = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(feats * m, axis=0) / n
                var = jnp.sum(jnp.square(feats - mean) * m, axis=0) / n
            if not self.is_initializing():
                # torch tracks *unbiased* variance in running stats
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)

        return weight * (feats - mean) * jax.lax.rsqrt(var + self.eps) + bias


class LayerNorm(nn.Module):
    """``nn.LayerNorm`` equivalent (elementwise affine, eps 1e-5)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, feats: jax.Array, *_, **__):
        return nn.LayerNorm(epsilon=self.eps)(feats)


class ContraNorm(nn.Module):
    """Feature-decorrelation norm (reference ``models/norm.py:32-45``):

        W = softmax(X^T X / temp, axis=1)
        X <- (1 + use_scale*scale) * X - scale * X W
        X <- BatchNorm1d(X)

    Padding rows are excluded from the Gram matrix and the BN statistics.
    """

    dim: int
    scale: float = 0.0
    temp: float = 1.0
    use_scale: bool = False

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,
        mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = False,
    ):
        x = feats if mask is None else feats * mask.astype(feats.dtype)[:, None]
        weights = jax.nn.softmax(
            (x.T @ x) / self.temp, axis=1
        )
        multiplier = 1.0 + int(self.use_scale) * self.scale
        out = multiplier * feats - self.scale * (feats @ weights)
        return MaskedBatchNorm(self.dim, name="norm")(
            out, mask, deterministic=deterministic
        )


# ----------------------------------------------------------------------
# (graphs, feats)-signature adapters (reference models/norm.py:48-65)
# ----------------------------------------------------------------------

class GraphContraNorm(nn.Module):
    dim: int
    scale: float = 0.0
    temp: float = 1.0
    use_scale: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, feats, *, deterministic=False):
        return ContraNorm(self.dim, self.scale, self.temp, self.use_scale)(
            feats, graph.node_mask, deterministic=deterministic
        )


class GraphBatchNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, graph: GraphBatch, feats, *, deterministic=False):
        return MaskedBatchNorm(self.dim)(
            feats, graph.node_mask, deterministic=deterministic
        )


class GraphLayerNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, graph: GraphBatch, feats, *, deterministic=False):
        return LayerNorm(self.dim)(feats)


class GraphIdentity(nn.Module):
    dim: int = 0

    @nn.compact
    def __call__(self, graph: GraphBatch, feats, *, deterministic=False):
        return feats


class Identity(nn.Module):
    dim: int = 0

    @nn.compact
    def __call__(self, feats, *_, **__):
        return feats


def get_norm(norm: str, with_graph: bool, dim: int, **kwargs) -> nn.Module:
    """Factory dispatching 'gn'/'cn'/'bn'/'ln'/'none' (reference
    ``models/norm.py:68-82``; 'gn' only valid with_graph)."""
    if with_graph:
        table = {
            "gn": GraphNorm,
            "cn": GraphContraNorm,
            "bn": GraphBatchNorm,
            "ln": GraphLayerNorm,
            "none": GraphIdentity,
        }
    else:
        table = {
            "cn": ContraNorm,
            "bn": MaskedBatchNorm,
            "ln": LayerNorm,
            "none": Identity,
        }
    if norm not in table:
        raise NotImplementedError(f"norm = {norm} not implemented")
    cls = table[norm]
    if norm == "none":
        return cls()
    return cls(dim, **kwargs)
