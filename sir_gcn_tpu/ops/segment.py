"""Segment / gather primitives (pure-XLA path).

TPU-native replacement for DGL's gSpMM/gSDDMM C++/CUDA kernels as consumed by
the reference at ``models/conv.py:63`` (``update_all`` with ``fn.sum`` /
``fn.mean`` / ``fn.max`` reducers). Edge arrays are dst-sorted (see
``sir_gcn_tpu.graph``), so all reductions here are deterministic — the TPU
analog of the reference's ``torch.use_deterministic_algorithms(True)`` kit
(``benchmark-datasets/ogbn-arxiv/train.py:14-24``).

These are also the correctness oracles for the fused Pallas kernels in
``sir_gcn_tpu.ops.pallas``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather ``x[idx]`` (the SDDMM-side operand build: DGL's
    ``edges.src[...]`` / ``edges.dst[...]`` access, ``models/conv.py:43-47``)."""
    return jnp.take(x, idx, axis=0)


def segment_sum(
    data: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Deterministic segment sum over dst-sorted ids (``fn.sum``)."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments,
        indices_are_sorted=True,
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    true_counts: jax.Array,
) -> jax.Array:
    """``fn.mean`` semantics: sum / true in-degree; zero-degree segments -> 0.

    ``true_counts`` is the count of *real* contributing edges per segment
    (padding edges must already be zeroed out of ``data``).
    """
    s = segment_sum(data, segment_ids, num_segments)
    denom = jnp.maximum(true_counts, 1.0)
    return s / denom.reshape((num_segments,) + (1,) * (s.ndim - 1))


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    valid: jax.Array,
) -> jax.Array:
    """``fn.max`` semantics: per-segment max with DGL's zero-fill for empty
    segments (a node with no in-edges reduces to 0, not -inf).

    ``valid`` is a bool [E] mask; invalid (padding / dropped) edges are
    excluded from the max.
    """
    neg = jnp.finfo(data.dtype).min
    masked = jnp.where(valid.reshape((-1,) + (1,) * (data.ndim - 1)), data, neg)
    m = jax.ops.segment_max(
        masked, segment_ids, num_segments,
        indices_are_sorted=True,
    )
    has_any = segment_sum(
        valid.astype(data.dtype), segment_ids, num_segments
    ) > 0
    return jnp.where(
        has_any.reshape((num_segments,) + (1,) * (m.ndim - 1)), m, 0.0
    )


def segment_softmax(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    valid: jax.Array,
) -> jax.Array:
    """Per-dst-segment softmax over edges (needed for GATv2-style baselines,
    reference ``dgl.nn.GATv2Conv`` usage at
    ``synthetic-datasets/dictionary-lookup/model.py:101``)."""
    vmask = valid.reshape((-1,) + (1,) * (data.ndim - 1))
    neg = jnp.finfo(data.dtype).min
    masked = jnp.where(vmask, data, neg)
    seg_max = jax.ops.segment_max(
        masked, segment_ids, num_segments, indices_are_sorted=True
    )
    # Segments that are empty (-inf) or all-invalid (== neg, still finite!)
    # get max 0; the where BELOW must exclude invalid edges BEFORE exp, or
    # exp overflows for them and its VJP turns inf * 0 into NaN (zero
    # in-degree nodes / padding segments poisoned every gradient).
    seg_max = jnp.where(seg_max > neg / 2, seg_max, 0.0)
    shifted = jnp.where(
        vmask, data - jnp.take(seg_max, segment_ids, axis=0), neg)
    e = jnp.exp(shifted)  # exp(neg) == 0 for invalid edges
    denom = segment_sum(e, segment_ids, num_segments)
    denom = jnp.maximum(denom, jnp.finfo(data.dtype).tiny)
    return e / jnp.take(denom, segment_ids, axis=0)
