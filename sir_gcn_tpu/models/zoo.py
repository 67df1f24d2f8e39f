"""Baseline conv zoo: GCN / GATv2 / GIN / GraphSAGE expressed through the
framework's gather/segment primitives.

The reference pulls these from ``dgl.nn`` for its contrast experiments
(``synthetic-datasets/dictionary-lookup/model.py:47-155``,
``benchmark-datasets/*/model.py`` GIN/GAT baselines). Each class mirrors the
corresponding DGL layer's math on the settings the reference uses.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import copy_src_aggregate, segment
from .layers import Linear


class GraphConv(nn.Module):
    """Kipf-Welling GCN layer, DGL ``GraphConv`` with norm='both',
    allow_zero_in_degree=True: h_u = b + W sum_v h_v / sqrt(d_out(v) d_in(u)).
    Zero-in-degree nodes produce 0 (+ bias)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: GraphBatch, feat: jax.Array,
                 edge_mask: Optional[jax.Array] = None) -> jax.Array:
        out_norm = jnp.power(jnp.maximum(graph.out_deg, 1.0), -0.5)
        in_norm = jnp.power(jnp.maximum(graph.in_deg, 1.0), -0.5)
        x = feat * out_norm[:, None]
        x = Linear(self.features, use_bias=False, name="weight")(x)
        agg = copy_src_aggregate(graph, x, "sum", edge_mask=edge_mask)
        agg = agg * in_norm[:, None]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            agg = agg + bias
        return agg


class GATv2Conv(nn.Module):
    """GATv2 (Brody et al.), DGL ``GATv2Conv``:
    e_vu = a^T LeakyReLU(W h_u + W h_v), attention softmax over incoming
    edges of u, h_u = sum_v alpha_vu W h_v. Returns [N, heads, out].

    ``attn_dropout`` drops normalized attention weights (DGL attn_drop);
    ``residual`` adds the input, projected by a bias-free linear when the
    width differs from heads*out (DGL res_fc); ``use_bias`` controls the
    fc/res projections' bias term (DGL bias)."""

    features: int
    num_heads: int = 1
    negative_slope: float = 0.2
    share_weights: bool = True
    attn_dropout: float = 0.0
    residual: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: GraphBatch, feat: jax.Array,
                 edge_mask: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        H, F = self.num_heads, self.features
        fsrc = Linear(H * F, use_bias=self.use_bias,
                      name="fc_src")(feat).reshape(-1, H, F)
        if self.share_weights:
            fdst = fsrc
        else:
            fdst = Linear(H * F, use_bias=self.use_bias,
                          name="fc_dst")(feat).reshape(-1, H, F)
        attn = self.param("attn", nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"), (H, F))

        valid = (graph.edge_mask if edge_mask is None
                 else jnp.logical_and(graph.edge_mask, edge_mask))
        z = (jnp.take(fdst, graph.dst, axis=0)
             + jnp.take(fsrc, graph.src, axis=0))      # [E, H, F]
        e = jnp.sum(nn.leaky_relu(z, self.negative_slope) * attn, -1)  # [E,H]
        alpha = segment.segment_softmax(e, graph.dst, graph.n_pad, valid)
        alpha = nn.Dropout(self.attn_dropout,
                           deterministic=deterministic)(alpha)
        msg = jnp.take(fsrc, graph.src, axis=0) * alpha[..., None]
        vmask = valid[:, None, None]
        msg = jnp.where(vmask, msg, 0.0)
        rst = jax.ops.segment_sum(msg, graph.dst, graph.n_pad,
                                  indices_are_sorted=True)
        if self.residual:
            if feat.shape[-1] != H * F:
                res = Linear(H * F, use_bias=self.use_bias,
                             name="res_fc")(feat)
            else:
                res = feat
            rst = rst + res.reshape(-1, H, F)
        return rst


class GINConv(nn.Module):
    """GIN layer, DGL ``GINConv`` (default eps=0, not learned):
    h_u = apply_func((1 + eps) h_u + sum_v h_v)."""

    apply_func: Callable[[jax.Array], jax.Array]
    init_eps: float = 0.0
    learn_eps: bool = False
    agg: str = "sum"

    @nn.compact
    def __call__(self, graph: GraphBatch, feat: jax.Array,
                 edge_mask: Optional[jax.Array] = None) -> jax.Array:
        if self.learn_eps:
            eps = self.param("eps", lambda *_: jnp.asarray(self.init_eps))
        else:
            eps = self.init_eps
        agg = copy_src_aggregate(graph, feat, self.agg, edge_mask=edge_mask)
        return self.apply_func((1.0 + eps) * feat + agg)


class GINEConv(nn.Module):
    """GINE (GIN with edge features), DGL ``GINEConv``:
    h_u = apply_func((1 + eps) h_u + sum_v ReLU(h_v + e_uv)).
    ``efeat`` given in original edge order."""

    apply_func: Callable[[jax.Array], jax.Array]
    init_eps: float = 0.0

    @nn.compact
    def __call__(self, graph: GraphBatch, feat: jax.Array, efeat: jax.Array,
                 edge_mask: Optional[jax.Array] = None) -> jax.Array:
        valid = (graph.edge_mask if edge_mask is None
                 else jnp.logical_and(graph.edge_mask, edge_mask))
        e = jnp.take(efeat, graph.edge_perm, axis=0)
        msg = jax.nn.relu(jnp.take(feat, graph.src, axis=0) + e)
        msg = jnp.where(valid[:, None], msg, 0.0)
        agg = jax.ops.segment_sum(msg, graph.dst, graph.n_pad,
                                  indices_are_sorted=True)
        return self.apply_func((1.0 + self.init_eps) * feat + agg)


class PNAConv(nn.Module):
    """Principal Neighbourhood Aggregation, DGL ``PNAConv``.

    The reference uses single tower, aggregators ['sum','max','std'],
    scalers ['identity'], residual=False
    (``synthetic-datasets/dictionary-lookup/model.py:155``); the full DGL
    surface — multiple towers with a mixing layer, min/mean/var
    aggregators, amplification/attenuation degree scalers with the
    train-set ``delta`` — is supported beyond that.

    Per tower t over the feature split h^t:
        m_vu = M_t([h_u^t || h_v^t])
        h_u' = U_t([h_u^t || scaled aggs of m])
    then tower outputs concatenate through a mixing linear (towers > 1).
    Scalers (Corso et al.): amplification log(d+1)/delta,
    attenuation delta/log(d+1), d = in-degree (clamped >= 1).
    """

    features: int
    aggregators: tuple = ("sum", "max", "std")
    scalers: tuple = ("identity",)
    num_towers: int = 1
    delta: float = 1.0

    @nn.compact
    def __call__(self, graph: GraphBatch, feat: jax.Array,
                 edge_mask: Optional[jax.Array] = None) -> jax.Array:
        valid = (graph.edge_mask if edge_mask is None
                 else jnp.logical_and(graph.edge_mask, edge_mask))
        din = feat.shape[-1]
        T = self.num_towers
        assert din % T == 0 and self.features % T == 0, (
            "in/out feature dims must divide num_towers")
        n = graph.n_pad
        counts = jnp.maximum(jax.ops.segment_sum(
            valid.astype(feat.dtype), graph.dst, n,
            indices_are_sorted=True), 1.0)[:, None]
        logd = jnp.log(jnp.maximum(graph.in_deg, 1.0) + 1.0)[:, None]

        h_dst = jnp.take(feat, graph.dst, axis=0)
        h_src = jnp.take(feat, graph.src, axis=0)
        vmask = valid[:, None]

        outs = []
        for t in range(T):
            sl = slice(t * din // T, (t + 1) * din // T)
            m = Linear(din // T, name=f"M_{t}" if T > 1 else "M")(
                jnp.concatenate([h_dst[:, sl], h_src[:, sl]], -1))
            m0 = jnp.where(vmask, m, 0.0)
            s = jax.ops.segment_sum(m0, graph.dst, n,
                                    indices_are_sorted=True)

            aggs = []
            for agg in self.aggregators:
                if agg == "sum":
                    aggs.append(s)
                elif agg == "mean":
                    aggs.append(s / counts)
                elif agg == "max":
                    aggs.append(segment.segment_max(m, graph.dst, n, valid))
                elif agg == "min":
                    aggs.append(-segment.segment_max(-m, graph.dst, n,
                                                     valid))
                elif agg in ("std", "var"):
                    mean = s / counts
                    sq = jax.ops.segment_sum(
                        jnp.where(vmask, m * m, 0.0), graph.dst, n,
                        indices_are_sorted=True) / counts
                    v = jax.nn.relu(sq - mean * mean)
                    aggs.append(v if agg == "var"
                                else jnp.sqrt(v + 1e-10))
                else:
                    raise NotImplementedError(agg)

            parts = [feat[:, sl]]
            for a in aggs:
                for sc in self.scalers:
                    if sc == "identity":
                        parts.append(a)
                    elif sc == "amplification":
                        parts.append(a * (logd / self.delta))
                    elif sc == "attenuation":
                        parts.append(a * (self.delta / logd))
                    else:
                        raise NotImplementedError(sc)
            outs.append(Linear(self.features // T,
                               name=f"U_{t}" if T > 1 else "U")(
                jnp.concatenate(parts, -1)))

        out = outs[0] if T == 1 else jnp.concatenate(outs, -1)
        if T > 1:
            out = Linear(self.features, name="mixing")(out)
        return out


def pna_delta(graphs_in_deg) -> float:
    """Train-set normalization for PNA degree scalers:
    delta = mean over nodes of log(d + 1) (Corso et al. eq. 5)."""
    import numpy as np

    d = np.concatenate([np.asarray(x).ravel() for x in graphs_in_deg])
    return float(np.mean(np.log(np.maximum(d, 1.0) + 1.0)))


class SAGEConv(nn.Module):
    """GraphSAGE, DGL ``SAGEConv`` with aggregator_type='pool':
    h_pool = max_v ReLU(W_pool h_v + b); h_u = W_self h_u + W_neigh h_pool."""

    features: int

    @nn.compact
    def __call__(self, graph: GraphBatch, feat: jax.Array,
                 edge_mask: Optional[jax.Array] = None) -> jax.Array:
        valid = (graph.edge_mask if edge_mask is None
                 else jnp.logical_and(graph.edge_mask, edge_mask))
        pooled = jax.nn.relu(Linear(feat.shape[-1], name="fc_pool")(feat))
        msg = jnp.take(pooled, graph.src, axis=0)
        h_neigh = segment.segment_max(msg, graph.dst, graph.n_pad, valid)
        return (Linear(self.features, use_bias=False, name="fc_self")(feat)
                + Linear(self.features, name="fc_neigh")(h_neigh))
