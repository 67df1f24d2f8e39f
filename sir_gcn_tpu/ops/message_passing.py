"""The SIR-GCN message-passing pipeline: gather -> edge transform -> reduce.

This is the framework's core compute op — the TPU-native equivalent of the
reference's ``graph.update_all(message_func, reduce)`` call
(``/root/reference/models/conv.py:63,130,174,218``), expressed as one
functional pipeline XLA can fuse, with an optional Pallas fast path
(``sir_gcn_tpu.ops.pallas``) engaged automatically for ELL FastGraphs.

Math contract (preserved exactly from ``models/conv.py``):

  sum/mean/sym:  h*_u = reduce_{(v,u) in E} s_vu * sigma(eq_u + ek_v [+ e_vu])
                 followed by the *hoisted* W_R applied per node (conv.py:65)
  max:           h*_u = max_{(v,u)} W_R sigma(eq_u + ek_v [+ e_vu])
                 (W_R per edge, before the reduce — conv.py:47)
  sym scale:     s_vu = out_deg(v)^-1/2 * in_deg(u)^-1/2, degrees clamped >= 1
                 (conv.py:51-57); s_vu = 1 otherwise.

Empty-neighborhood semantics follow DGL: sum/mean -> 0, max -> 0 (zero fill).
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from . import segment as seg

# Scale guards. Since round 5 both expensive variants have fused Pallas
# fast routes on TPU (tools/r5bench.py, same-session A/B at 2.5M padded
# edges / H=96->128): the fused-edge path (e_basis/w_edge) runs 53.1
# ms/iter chained (1.62x the 32.9 ms no-edge floor — at the 5-take cost
# model) with a ~45 s compile and chains gradient steps fine; the
# Pallas max kernels run 54.3 ms/iter chained / 79-80 ms single-dispatch
# vs the XLA-composed 152.7-154.5 ms. The warnings below fire only when
# the OLD compositions actually run — the generic [E_pad, H]-projection
# edge path (still ~90-170 s compile, ~127 ms/iter, and >15-min compile
# if grad steps are chained in one jit — reconfirmed round 5) and the
# XLA-composed max fallback (CPU, or a closure-capturing sigma).
EDGE_FEATURE_EDGE_LIMIT = 500_000
MAX_AGG_WARN_EDGES = 500_000
_ALLOW_LARGE_EDGE_AGG = False
_EDGE_AGG_WARNED: set = set()
_MAX_AGG_WARNED: set = set()


def allow_large_edge_aggregate(enabled: bool = True) -> None:
    """Silence the edge-feature scale warning: ``sir_aggregate`` with
    edge features above ``EDGE_FEATURE_EDGE_LIMIT`` edges proceeds
    without the once-per-size compile-cost warning (measured ~90-170 s
    first compile + ~120 ms/iter at 2.5M edges — ROADMAP round 4)."""
    global _ALLOW_LARGE_EDGE_AGG
    _ALLOW_LARGE_EDGE_AGG = bool(enabled)


def _max_pallas_route(graph, activation, eq) -> bool:
    """Whether a max aggregation on this graph would take the fused
    Pallas kernels (``make_ell_sir_aggregate_max_pallas``)."""
    from .ell import FastGraph, _activation_info
    from .pallas import pallas_available

    if not (isinstance(graph, FastGraph)
            and type(graph).__name__ != "HaloGraph"
            and pallas_available()):
        return False
    return _activation_info(activation, eq.shape[-1])[1]


def _scale_guards(graph, agg_type: str, has_edge_feats: bool,
                  fused_edge: bool = False,
                  pallas_max: bool = False) -> None:
    """Once-per-size cost warnings for the XLA-composed edge/max
    variants. ``fused_edge`` / ``pallas_max`` suppress the respective
    warning: the fused Pallas routes (round 5) do not carry the measured
    pathologies."""
    e_pad = int(graph.e_pad)
    if (has_edge_feats and not fused_edge
            and e_pad > EDGE_FEATURE_EDGE_LIMIT
            and not _ALLOW_LARGE_EDGE_AGG):
        if e_pad not in _EDGE_AGG_WARNED:  # once per graph size
            _EDGE_AGG_WARNED.add(e_pad)
            warnings.warn(
                f"sir_aggregate with edge features is using the GENERIC "
                f"[E_pad, H]-projection path on a graph with {e_pad} "
                f"padded edges (> {EDGE_FEATURE_EDGE_LIMIT}): expect a "
                f"long FIRST XLA compile at this scale (measured "
                f"~90-170 s at 2.5M edges on a v5e; the persistent "
                f"compile cache makes repeat processes cheap) and "
                f"~2-2.4x the no-edge step cost (~127 ms single-dispatch "
                f"— ROADMAP.md). Do NOT chain multiple gradient steps "
                f"inside one jit on THIS path (lax.scan/fori_loop "
                f"training loops included): that shape compiles "
                f"pathologically (>15 min, reconfirmed round 5). Jit ONE "
                f"train step and loop in Python — MIGRATION.md "
                f"'SIREConv at full-graph scale'. On TPU the FUSED edge "
                f"route avoids all of this: pass raw edge features + "
                f"W_E as (e_basis, w_edge) — SIREConv's default Linear "
                f"encoder with inactive edge dropout routes there "
                f"automatically — measured 53.1 ms/iter chained (1.62x "
                f"the no-edge floor), ~45 s compile, and chained grad "
                f"steps compile fine. Call "
                f"sir_gcn_tpu.ops.allow_large_edge_aggregate(True) "
                f"to silence this warning.",
                stacklevel=3)
    if agg_type == "max" and not pallas_max and e_pad > MAX_AGG_WARN_EDGES:
        if e_pad not in _MAX_AGG_WARNED:  # once per graph size
            _MAX_AGG_WARNED.add(e_pad)
            warnings.warn(
                f"max aggregation on a graph with {e_pad} padded edges "
                f"is using the XLA-COMPOSED slot path (CPU backend, or "
                f"a closure-capturing sigma): the per-edge W_R matmul "
                f"before the reduce (reference models/conv.py:47) "
                f"measured 152.7-154.5 ms single-dispatch at 2.5M edges "
                f"/ H=96 on a v5e. On TPU with a pallas-compatible "
                f"sigma the fused Pallas max kernels run instead "
                f"(automatic, no flag): 54 ms/iter chained, ~1.7x the "
                f"linear path and 1.9x faster than this fallback "
                f"(ROADMAP.md round 5). Consider agg_type "
                f"'sum'/'mean'/'sym' at full-graph scale if neither "
                f"applies.",
                stacklevel=3)


_EDGE_DTYPE = None  # None (f32) | jnp.bfloat16


def set_edge_dtype(dtype) -> None:
    """Set the edge-pipeline carry dtype for the Pallas fast path
    (None = f32 exact; jnp.bfloat16 halves HBM traffic, f32 accumulation
    — the framework's AMP analog for message passing)."""
    global _EDGE_DTYPE
    _EDGE_DTYPE = dtype


def get_edge_dtype():
    return _EDGE_DTYPE


_REMAT = False


def set_remat(enabled: bool) -> None:
    """Activation checkpointing for the fast path (SURVEY §7
    recompute-vs-store): save node-sized inputs instead of slot-sized
    [~E, H] tensors and recompute the slot gather in backward. Numerics
    identical; ~E x H x bytes less live memory per conv layer at the cost
    of one extra gather."""
    global _REMAT
    _REMAT = bool(enabled)


def get_remat() -> bool:
    return _REMAT


def _edge_scale(graph: GraphBatch, agg_type: str) -> Optional[jax.Array]:
    """Per-edge symmetric-norm scale s_vu, or None for non-sym aggregators."""
    if agg_type != "sym":
        return None
    in_norm = jnp.power(jnp.maximum(graph.in_deg, 1.0), -0.5)
    out_norm = jnp.power(jnp.maximum(graph.out_deg, 1.0), -0.5)
    return jnp.take(out_norm, graph.src) * jnp.take(in_norm, graph.dst)


def sir_aggregate(
    graph: GraphBatch,
    eq: jax.Array,
    ek: jax.Array,
    activation: Callable[[jax.Array], jax.Array],
    agg_type: str = "sum",
    *,
    e: Optional[jax.Array] = None,
    e_basis: Optional[jax.Array] = None,
    w_edge: Optional[jax.Array] = None,
    w_relation: Optional[jax.Array] = None,
    b_relation: Optional[jax.Array] = None,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused SIR edge aggregation.

    Parameters
    ----------
    eq, ek : [N_pad, H]
        Query (dst-side) and key (src-side) node projections.
    activation : callable
        sigma. Any jittable elementwise or row-wise function (the
        Base variants pass an MLP here).
    agg_type : 'sum' | 'mean' | 'max' | 'sym'
    e : optional [E_pad, H]
        Edge-feature projection in *sorted edge order* (caller gathers via
        ``graph.edge_perm``); added inside sigma (conv.py:111).
    e_basis, w_edge : optional [E_pad, De] / [De, H]
        Alternative to ``e`` for AFFINE edge encoders: the raw edge
        features (sorted order) and the projection ``linear_edge``
        (conv.py:86: bias=False), so ``e = e_basis @ w_edge``. On the
        TPU fast path this engages the fused-edge kernels — the wide
        [E_pad, H] projection and its cotangent never materialize
        (``make_ell_sir_aggregate_pallas_fused_edge``); elsewhere the
        projection is computed here and the generic path runs.
        Embedding encoders fit by passing a one-hot basis. ``e_basis``
        receives no gradient.
    w_relation, b_relation : optional [H, O] / [O]
        Required for ``max``: the per-edge W_R applied before the reduce.
        Ignored for linear aggregators (the caller hoists W_R per node).
    edge_mask : optional bool [E_pad]
        Extra mask (DropEdge); combined with the padding mask.

    Returns
    -------
    [N_pad, H] for linear aggregators, [N_pad, O] for max.
    """
    if agg_type not in ("sum", "mean", "max", "sym"):
        raise NotImplementedError(f"agg_type = {agg_type} not implemented")
    assert e is None or e_basis is None, "pass e OR (e_basis, w_edge)"
    if e_basis is not None:
        assert w_edge is not None, "e_basis needs w_edge"

    from .ell import (
        FastGraph,
        _activation_info,
        ell_sir_aggregate,
        make_ell_sir_aggregate_pallas_fused_edge,
    )
    from .pallas import pallas_available

    # fused-edge route (VERDICT r4 item 1a): FastGraph + TPU + linear agg
    # + elementwise pallas-compatible sigma
    fused_edge = False
    if (e_basis is not None and isinstance(graph, FastGraph)
            and agg_type in ("sum", "mean", "sym")
            and type(graph).__name__ != "HaloGraph"
            and pallas_available()):
        elem, pallas_ok = _activation_info(activation, eq.shape[-1])
        fused_edge = elem and pallas_ok
    if e_basis is not None and not fused_edge:
        e = (e_basis @ w_edge).astype(eq.dtype)
        e_basis = w_edge = None

    _scale_guards(graph, agg_type, e is not None,
                  fused_edge=fused_edge,
                  pallas_max=(agg_type == "max"
                              and _max_pallas_route(graph, activation, eq)))

    if type(graph).__name__ == "HaloGraph":  # lazy: avoid import cycle
        from ..parallel.halo import halo_sir_aggregate

        if agg_type == "max":
            assert w_relation is not None, \
                "max aggregation needs W_R per edge"
        return halo_sir_aggregate(graph, eq, ek, activation, agg_type,
                                  e=e, w_relation=w_relation,
                                  b_relation=b_relation,
                                  edge_mask=edge_mask)

    if fused_edge:
        g = graph.graph
        static = (edge_mask is None and graph.dst_slot_scales is not None
                  and agg_type in graph.dst_slot_scales)
        f = make_ell_sir_aggregate_pallas_fused_edge(
            graph, activation, agg_type, edge_dtype=get_edge_dtype(),
            static_scale=static)
        if static:
            scale = jnp.zeros((graph.e_pad,), jnp.float32)  # unused
        else:
            valid = g.edge_mask if edge_mask is None else jnp.logical_and(
                g.edge_mask, edge_mask)
            scale = valid.astype(eq.dtype)
            sym_scale = _edge_scale(g, agg_type)
            if sym_scale is not None:
                scale = scale * sym_scale
        out = f(eq, ek, e_basis, w_edge, scale)
        if agg_type == "mean" and not static:
            counts = graph.dst_plan.reduce_slots_sum(
                graph.dst_plan.gather_edges(scale)[:, None]
                * graph.dst_plan.slot_valid[:, None])
            out = out / jnp.maximum(counts, 1.0)
        return out

    if isinstance(graph, FastGraph) and agg_type in ("sum", "mean", "sym"):
        g = graph.graph
        if (edge_mask is None and graph.dst_slot_scales is not None
                and agg_type in graph.dst_slot_scales):
            # No dynamic mask: consume the host-precomputed per-slot
            # scales (mean's degree division folded in) — removes every
            # per-edge scalar take from the hot path.
            return ell_sir_aggregate(graph, eq, ek, activation, agg_type,
                                     e=e, static_scale=True)
        valid = g.edge_mask if edge_mask is None else jnp.logical_and(
            g.edge_mask, edge_mask)
        scale = valid.astype(eq.dtype)
        sym_scale = _edge_scale(g, agg_type)
        if sym_scale is not None:
            scale = scale * sym_scale
        out = ell_sir_aggregate(graph, eq, ek, activation, agg_type,
                                e=e, edge_scale=scale)
        if agg_type == "mean":
            counts = graph.dst_plan.reduce_slots_sum(
                graph.dst_plan.gather_edges(scale)[:, None]
                * graph.dst_plan.slot_valid[:, None])
            out = out / jnp.maximum(counts, 1.0)
        return out
    if isinstance(graph, FastGraph):  # max aggregation fast path
        from .ell import (
            make_ell_sir_aggregate_max,
            make_ell_sir_aggregate_max_pallas,
        )

        assert w_relation is not None, "max aggregation needs W_R per edge"
        g = graph.graph
        valid = g.edge_mask if edge_mask is None else jnp.logical_and(
            g.edge_mask, edge_mask)
        if _max_pallas_route(graph, activation, eq):
            f = make_ell_sir_aggregate_max_pallas(
                graph, activation, with_edge=e is not None,
                edge_dtype=get_edge_dtype())
        else:
            f = make_ell_sir_aggregate_max(graph, activation,
                                           with_edge=e is not None)
        b = (b_relation if b_relation is not None
             else jnp.zeros((w_relation.shape[1],), eq.dtype))
        if e is None:
            e = jnp.zeros((0,), eq.dtype)
        return f(eq, ek, e, valid.astype(eq.dtype), w_relation, b)

    valid = graph.edge_mask if edge_mask is None else jnp.logical_and(
        graph.edge_mask, edge_mask
    )
    n = graph.n_pad

    z = jnp.take(eq, graph.dst, axis=0) + jnp.take(ek, graph.src, axis=0)
    if e is not None:
        z = z + e
    m = activation(z)

    if agg_type == "max":
        assert w_relation is not None, "max aggregation needs W_R per edge"
        m = m @ w_relation
        if b_relation is not None:
            m = m + b_relation
        return seg.segment_max(m, graph.dst, n, valid)

    scale = _edge_scale(graph, agg_type)
    vmask = valid.reshape((-1,) + (1,) * (m.ndim - 1))
    if scale is not None:
        m = m * scale.reshape(vmask.shape)
    m = jnp.where(vmask, m, 0.0)

    if agg_type == "mean":
        counts = seg.segment_sum(valid.astype(m.dtype), graph.dst, n)
        return seg.segment_mean(m, graph.dst, n, counts)
    return seg.segment_sum(m, graph.dst, n)


def sir_aggregate_concat(
    graph: GraphBatch,
    eq: jax.Array,
    ek: jax.Array,
    message_func: Callable[[jax.Array], jax.Array],
    agg_type: str = "sum",
    *,
    e: Optional[jax.Array] = None,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Generic concatenated form ``reduce g([h_u || h_v (|| h_uv)])`` used by
    ``SIRConvBase`` / ``SIREConvBase`` (conv.py:156-158, 199-201).

    Column order matches the reference message_func exactly —
    ``torch.cat((edges.dst['eq'], edges.src['ek'], edges.data['e']))``
    (conv.py:201) — so reference message-MLP weights port verbatim.
    ``message_func`` g is an arbitrary jittable row-wise module applied to the
    per-edge concatenation; degree scaling applies for 'sym'.
    """
    if agg_type not in ("sum", "mean", "max", "sym"):
        raise NotImplementedError(f"agg_type = {agg_type} not implemented")

    valid = graph.edge_mask if edge_mask is None else jnp.logical_and(
        graph.edge_mask, edge_mask
    )
    n = graph.n_pad

    parts = [jnp.take(eq, graph.dst, axis=0),
             jnp.take(ek, graph.src, axis=0)]
    if e is not None:
        parts.append(e)
    m = message_func(jnp.concatenate(parts, axis=-1))

    if agg_type == "max":
        return seg.segment_max(m, graph.dst, n, valid)

    scale = _edge_scale(graph, agg_type)
    vmask = valid.reshape((-1,) + (1,) * (m.ndim - 1))
    if scale is not None:
        m = m * scale.reshape(vmask.shape)
    m = jnp.where(vmask, m, 0.0)

    if agg_type == "mean":
        counts = seg.segment_sum(valid.astype(m.dtype), graph.dst, n)
        return seg.segment_mean(m, graph.dst, n, counts)
    return seg.segment_sum(m, graph.dst, n)


def copy_src_aggregate(
    graph: GraphBatch,
    x: jax.Array,
    agg_type: str = "sum",
    *,
    edge_scale: Optional[jax.Array] = None,
    edge_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """``update_all(fn.copy_u, fn.sum|mean|max)`` — the plain SpMM used by the
    Correct & Smooth label-spreading loop
    (``benchmark-datasets/ogbn-arxiv/correct_and_smooth.py:41-58``) and by
    GCN/GIN-style baseline convs."""
    valid = graph.edge_mask if edge_mask is None else jnp.logical_and(
        graph.edge_mask, edge_mask
    )
    n = graph.n_pad
    m = jnp.take(x, graph.src, axis=0)
    if agg_type == "max":
        return seg.segment_max(m, graph.dst, n, valid)
    vmask = valid.reshape((-1,) + (1,) * (m.ndim - 1))
    if edge_scale is not None:
        m = m * edge_scale.reshape(vmask.shape)
    m = jnp.where(vmask, m, 0.0)
    if agg_type == "mean":
        counts = seg.segment_sum(valid.astype(m.dtype), graph.dst, n)
        return seg.segment_mean(m, graph.dst, n, counts)
    return seg.segment_sum(m, graph.dst, n)
