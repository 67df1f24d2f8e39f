"""ELLPACK-style fast path for SIR message passing on TPU.

This module is the performance core of the framework — the TPU-native
replacement for DGL's fused gSpMM/gSDDMM CUDA kernels (reference
``models/conv.py:63`` ``update_all``; SURVEY §2b N1-N3, N12).

Why not CSR segment ops? Measured on a v5e chip at ogbn-arxiv scale
(2.5M edges, H=96..128): XLA's sorted ``segment_sum`` sustains ~45 GB/s and
its fused gather+scatter loop ~85 GB/s, while plain streaming ops run at
300-400 GB/s and a random row ``take`` at ~210 GB/s. The scatter is the
bottleneck, and the TPU vector unit has no wide gather/scatter (Mosaic's
``dynamic_gather`` addresses a single vreg). So the problem is
restructured so that **no scatter appears anywhere, in forward or
backward**:

* **Degree-bucketed ELL layout** (host-built once per graph): nodes are
  permuted into power-of-two *budget* buckets; each node's incoming edges
  occupy a contiguous run of ``budget`` slots (padded, zero-scale). Hub
  nodes with degree > ``max_budget`` split into chunk rows combined by a
  second bucketed stage.
* Reductions become ``reshape(-1, budget, H).sum(1)`` — pure streaming.
* Gathers are row ``take`` ops — the one pattern the HW does well.
* The backward pass uses a mirrored src-keyed plan plus a slot
  permutation (``jax.custom_vjp``): backward of gather = bucketed
  segment-sum in the transposed layout; backward of the bucketed sum =
  broadcast. (SURVEY N12.)
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphBatch

MAX_BUDGET = 256

# Stage timings of the most recent top-level plan build (seconds).
# Read via plan_timings() after building; bench.py logs them. The
# timers themselves are ~20 perf_counter calls — free. Every top-level
# builder (build_fast_graph here; the sharded/halo builders in
# parallel/) calls reset_plan_timings() on entry so standalone
# build_reduce_plan calls don't accumulate across unrelated builds.
_PLAN_TIMINGS: dict = {}
_LAST_MEMO_HIT: bool = False


def plan_timings() -> dict:
    return dict(_PLAN_TIMINGS)


def reset_plan_timings() -> None:
    global _LAST_MEMO_HIT
    _PLAN_TIMINGS.clear()
    _LAST_MEMO_HIT = False


def last_build_memo_hit() -> bool:
    """Whether the most recent top-level plan build was a content-memo
    hit (in which case plan_timings() holds only the hash stage)."""
    return _LAST_MEMO_HIT


# Host NumPy mirrors of ReducePlan slot arrays, id-keyed and
# weakref-finalized (same pattern as graph._HOST_MIRRORS).
_PLAN_MIRRORS: dict = {}


def _register_plan_mirror(plan, arrays: dict) -> None:
    import weakref

    _PLAN_MIRRORS[id(plan)] = arrays
    weakref.finalize(plan, _PLAN_MIRRORS.pop, id(plan), None)


def plan_host_array(plan, name: str) -> np.ndarray:
    m = _PLAN_MIRRORS.get(id(plan))
    if m is not None and name in m:
        return m[name]
    return np.asarray(getattr(plan, name))


@contextlib.contextmanager
def _timed_stage(stage: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _PLAN_TIMINGS[stage] = (_PLAN_TIMINGS.get(stage, 0.0)
                                + time.perf_counter() - t0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _batch_device_put(arrays: list) -> list:
    """Upload many small host arrays as ONE transfer per dtype, sliced
    back apart on the device.

    ``arrays``: list of (1-D np array, target dtype). The tunneled PJRT
    runtime pays a fixed per-transfer latency, so the ~25 separate
    plan/fast-graph uploads cost seconds where two concatenated ones cost
    a fraction (round-4 cold-start work; see ROADMAP). Device-side
    slicing dispatches asynchronously and the big staging buffer frees
    once the slices materialize."""
    from collections import defaultdict

    by_dt = defaultdict(list)
    for i, (arr, dt) in enumerate(arrays):
        by_dt[np.dtype(dt)].append(i)
    out = [None] * len(arrays)
    for dt, idxs in by_dt.items():
        flats = [np.ascontiguousarray(
            np.asarray(arrays[i][0]).astype(dt, copy=False)).reshape(-1)
            for i in idxs]
        if len(flats) == 1:
            out[idxs[0]] = jax.device_put(flats[0])
            continue
        big = jax.device_put(np.concatenate(flats))
        # one jitted split per (sizes, shape) instead of N eager slice
        # ops: each eager slice costs a first-call compile over the
        # tunnel (~0.3 s); one split executable costs one
        parts = _split_fn(tuple(f.size for f in flats))(big)
        for i, p in zip(idxs, parts):
            out[i] = p
    return out


import functools


@functools.lru_cache(maxsize=64)
def _split_fn(sizes):
    @jax.jit
    def split(big):
        outs, off = [], 0
        for sz in sizes:
            outs.append(jax.lax.slice(big, (off,), (off + sz,)))
            off += sz
        return tuple(outs)
    return split


# ======================================================================
# Reduce plan: bucketed slots + optional hub stage + key lookup
# ======================================================================

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReducePlan:
    """Reduce per-edge values by a key (dst or src), scatter-free.

    Slot arrays (length S1, grouped into ``buckets1`` of
    (budget, num_rows) runs): ``slot_edge`` is the sorted-edge id feeding
    the slot, ``slot_valid`` its 0/1 validity, ``slot_key`` its key node.
    ``s2_*`` combine hub chunk rows. ``key2row`` maps every key to its
    final row; keys with no edges map to an appended all-zero row.
    """

    slot_edge: jax.Array
    slot_valid: jax.Array
    slot_key: jax.Array
    row_key: jax.Array      # int32 [R1] stage-1 row -> key node id
    s2_gather: Optional[jax.Array]
    s2_valid: Optional[jax.Array]
    key2row: jax.Array
    buckets1: tuple = dataclasses.field(metadata=dict(static=True))
    buckets2: Optional[tuple] = dataclasses.field(
        metadata=dict(static=True))
    num_keys: int = dataclasses.field(metadata=dict(static=True))

    # -- core streaming ops -------------------------------------------
    @staticmethod
    def _bucket_reduce(values: jax.Array, buckets, op: str,
                       neg: float = 0.0) -> jax.Array:
        outs, s = [], 0
        for budget, nrows in buckets:
            n = budget * nrows
            blk = values[s:s + n].reshape(nrows, budget, -1)
            outs.append(blk.sum(1) if op == "sum" else blk.max(1))
            s += n
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _finalize(self, rows1: jax.Array, op: str, neg: float
                  ) -> jax.Array:
        if self.s2_gather is not None:
            vals = jnp.take(rows1, self.s2_gather, axis=0)
            if op == "sum":
                vals = vals * self.s2_valid[:, None]
            else:
                vals = jnp.where(self.s2_valid[:, None] > 0, vals, neg)
            rows = self._bucket_reduce(vals, self.buckets2, op, neg)
        else:
            rows = rows1
        fill = jnp.full((1, rows.shape[-1]), 0.0 if op == "sum" else neg,
                        rows.dtype)
        rows = jnp.concatenate([rows, fill])
        return jnp.take(rows, self.key2row, axis=0)

    def reduce_slots_sum(self, slot_values: jax.Array) -> jax.Array:
        """[S1, H] (already scaled/masked) -> [num_keys, H] sums."""
        return self._finalize(
            self._bucket_reduce(slot_values, self.buckets1, "sum"),
            "sum", 0.0)

    def reduce_slots_max(self, slot_values: jax.Array) -> jax.Array:
        """[S1, H] (invalid slots = -inf) -> [num_keys, H] maxes (empty
        keys -> -inf; caller zero-fills per DGL semantics)."""
        neg = jnp.finfo(slot_values.dtype).min
        return self._finalize(
            self._bucket_reduce(slot_values, self.buckets1, "max", neg),
            "max", neg)

    def finalize_rows_sum(self, rows1: jax.Array) -> jax.Array:
        """Stage-1 rows [R1, H] -> [num_keys, H] (applies the hub second
        stage and the key lookup). Used by the Pallas fast path, whose
        kernels emit stage-1 rows."""
        return self._finalize(rows1, "sum", 0.0)

    def spread(self, node_values: jax.Array) -> jax.Array:
        """[num_keys, H] -> [S1, H]: each slot gets its key's value.
        This is the exact transpose of reduce_slots_sum (and the forward
        eq-expand)."""
        return jnp.take(node_values, self.slot_key, axis=0)

    def gather_edges(self, edge_values: jax.Array) -> jax.Array:
        """[E_pad, ...] sorted-edge-order values -> [S1, ...] slot order."""
        return jnp.take(edge_values, self.slot_edge, axis=0)

    @property
    def num_slots(self) -> int:
        return self.slot_edge.shape[0]


def _chunk_budgets(chunk_cnt: np.ndarray) -> np.ndarray:
    """Budget per chunk: power of two up to 8, multiples of 2 to 16,
    multiples of 4 to 32, then multiples of 8.

    The finer steps cut slot inflation 1.234x -> 1.062x on the bench
    graph, and fewer slots means fewer random-take ROWS — the step's
    actual bottleneck (the round-3 take cost model: ~3.9 ns/row).
    Measured at STEP level with 3-window variance protocols (round 3):
    full train step 101.49 ms with this rule vs 105.41 ms with the
    coarse (pow2<=8, multiples-of-8) rule, spread <=0.2%. Caveats both
    measured and accounted: (a) non-multiple-of-8 budgets sublane-pad
    inside the kernels' (rows, budget, H) views, so ``_tile_rows``
    budgets VMEM on the PADDED middle dim (a B=10 bucket otherwise
    exceeds the 16 MB scoped limit); (b) a bare-aggregate microbench
    reads ~1.5 ms/layer SLOWER under this rule (VPU padding on odd
    buckets) — the step-level take savings dominate regardless."""
    c = np.maximum(chunk_cnt, 1)
    pow2 = 2 ** np.ceil(np.log2(c)).astype(np.int64)
    return np.where(
        c <= 8, pow2,
        np.where(c <= 16, ((c + 1) // 2) * 2,
                 np.where(c <= 32, ((c + 3) // 4) * 4,
                          ((c + 7) // 8) * 8))).astype(np.int64)


def _bucketize(item_keys: np.ndarray, item_ids: np.ndarray, num_keys: int,
               max_budget: int):
    """Group items by key, chunk runs at ``max_budget``, pad chunks to
    bucketed budgets (see :func:`_chunk_budgets`).

    Returns (slot_item [S], slot_valid [S], slot_key [S], buckets,
    row_keys [R]). Uses the native C++ builder when available."""
    order0 = np.argsort(item_keys, kind="stable")
    gkeys = np.ascontiguousarray(item_keys[order0], np.int64)
    gids = np.ascontiguousarray(item_ids[order0], np.int64)
    m = int(gkeys.shape[0])

    try:
        from .. import native as _native

        lib = _native.load_ellplan()
    except Exception:
        lib = None

    if lib is not None and m > 0:
        chunk_key = np.empty(m, np.int64)
        chunk_cnt = np.empty(m, np.int64)
        chunk_start = np.empty(m, np.int64)
        n_chunks = int(lib.ell_chunks(
            _native.as_i64p(gkeys), m, max_budget,
            _native.as_i64p(chunk_key), _native.as_i64p(chunk_cnt),
            _native.as_i64p(chunk_start)))
        chunk_key = chunk_key[:n_chunks]
        chunk_cnt = chunk_cnt[:n_chunks]
        chunk_start = chunk_start[:n_chunks]
        budgets = _chunk_budgets(chunk_cnt)

        order = np.ascontiguousarray(
            np.argsort(budgets, kind="stable"), np.int64)
        sorted_b = budgets[order]
        slot_base = np.zeros(n_chunks, np.int64)
        np.cumsum(sorted_b[:-1], out=slot_base[1:])
        total = int(sorted_b.sum())

        slot_item = np.empty(total, np.int64)
        slot_valid = np.empty(total, np.float32)
        slot_key = np.empty(total, np.int64)
        lib.ell_fill_slots(
            _native.as_i64p(gids), _native.as_i64p(chunk_key),
            _native.as_i64p(chunk_cnt), _native.as_i64p(chunk_start),
            _native.as_i64p(np.ascontiguousarray(budgets)),
            _native.as_i64p(order),
            _native.as_i64p(slot_base), n_chunks,
            _native.as_i64p(slot_item), _native.as_f32p(slot_valid),
            _native.as_i64p(slot_key))

        uniq_b, counts_b = np.unique(sorted_b, return_counts=True)
        buckets = [(int(b), int(c)) for b, c in zip(uniq_b, counts_b)]
        row_keys = chunk_key[order]
        return slot_item, slot_valid, slot_key, buckets, row_keys

    return _bucketize_numpy(item_keys, item_ids, num_keys, max_budget)


def _bucketize_numpy(item_keys: np.ndarray, item_ids: np.ndarray,
                     num_keys: int, max_budget: int):
    """Pure-NumPy reference implementation (fallback + test oracle)."""
    order = np.argsort(item_keys, kind="stable")
    gkeys = item_keys[order]
    gids = item_ids[order]
    uniq, counts = np.unique(gkeys, return_counts=True)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

    chunk_key, chunk_cnt, chunk_start = [], [], []
    for k, c, s in zip(uniq, counts, starts):
        for off in range(0, int(c), max_budget):
            chunk_key.append(k)
            chunk_cnt.append(min(int(c) - off, max_budget))
            chunk_start.append(int(s) + off)
    chunk_key = np.asarray(chunk_key, np.int64)
    chunk_cnt = np.asarray(chunk_cnt, np.int64)
    chunk_start = np.asarray(chunk_start, np.int64)
    budgets = _chunk_budgets(chunk_cnt)

    slot_item, slot_valid, slot_key = [], [], []
    buckets, row_keys = [], []
    for b in sorted(set(budgets.tolist())):
        sel = np.nonzero(budgets == b)[0]
        nrows = len(sel)
        items = np.zeros((nrows, b), np.int64)
        val = np.zeros((nrows, b), np.float32)
        kk = np.zeros((nrows, b), np.int64)
        for r, ci in enumerate(sel):
            c = int(chunk_cnt[ci])
            items[r, :c] = gids[chunk_start[ci]: chunk_start[ci] + c]
            val[r, :c] = 1.0
            kk[r, :] = chunk_key[ci]
        slot_item.append(items.reshape(-1))
        slot_valid.append(val.reshape(-1))
        slot_key.append(kk.reshape(-1))
        buckets.append((int(b), nrows))
        row_keys.append(chunk_key[sel])

    cat = lambda xs, d: (np.concatenate(xs) if xs
                         else np.zeros(0, d))
    return (cat(slot_item, np.int64), cat(slot_valid, np.float32),
            cat(slot_key, np.int64), buckets,
            cat(row_keys, np.int64))


def build_reduce_plan(keys: np.ndarray, valid: np.ndarray, num_keys: int,
                      max_budget: int = MAX_BUDGET,
                      force_stage2: bool = False) -> ReducePlan:
    """Host-side construction of a :class:`ReducePlan` over the graph's
    sorted-edge arrays. ``force_stage2`` always builds the hub second
    stage (needed when several plans must share a common static structure
    — see :func:`harmonize_reduce_plans`)."""
    keys = np.asarray(keys, np.int64)
    valid = np.asarray(valid, bool)
    eids = np.nonzero(valid)[0]

    with _timed_stage("bucketize"):
        slot_edge, slot_valid, slot_key, buckets1, row_keys = _bucketize(
            keys[eids], eids, num_keys, max_budget)

    # pad slots to multiple of 8 with an extra budget-1 bucket
    s_pad = max(_round_up(len(slot_edge), 8), 8)
    extra = s_pad - len(slot_edge)
    if extra:
        slot_edge = np.concatenate([slot_edge, np.zeros(extra, np.int64)])
        slot_valid = np.concatenate([slot_valid,
                                     np.zeros(extra, np.float32)])
        slot_key = np.concatenate([slot_key, np.zeros(extra, np.int64)])
        buckets1 = buckets1 + [(1, extra)]
        row_keys = np.concatenate(
            [row_keys, np.full(extra, num_keys, np.int64)])
    # device-side row->key (pad rows -> index 0; their contributions are
    # masked by zero slot_valid / never selected by key2row)
    row_key_dev = np.where(row_keys < num_keys, row_keys, 0)

    n_rows1 = len(row_keys)
    real = row_keys < num_keys
    multi = (np.bincount(row_keys[real], minlength=num_keys).max(initial=0)
             > 1)

    if multi or force_stage2:
        rids = np.nonzero(real)[0]
        if len(rids) == 0:
            # degenerate (no real rows): one all-pad stage-2 row
            s2_gather = np.zeros(1, np.int64)
            s2_valid = np.zeros(1, np.float32)
            buckets2 = [(1, 1)]
            row_keys2 = np.full(1, num_keys, np.int64)
        else:
            # stage 2 is tiny (<= E/max_budget rows): no chunk cap needed,
            # so every key collapses to exactly one row
            s2_gather, s2_valid, _, buckets2, row_keys2 = _bucketize(
                row_keys[rids], rids, num_keys, max_budget=1 << 30)
            assert (np.bincount(row_keys2[row_keys2 < num_keys],
                                minlength=num_keys).max(initial=0) <= 1)
        final_keys, n_final = row_keys2, len(row_keys2)
        s2_gather_np, s2_valid_np = s2_gather, s2_valid
        buckets2 = tuple(buckets2)
    else:
        s2_gather_np = s2_valid_np = None
        buckets2 = None
        final_keys, n_final = row_keys, n_rows1

    # key -> final row; empty keys -> appended zero row (index n_final)
    key2row = np.full(num_keys, n_final, np.int64)
    realf = final_keys < num_keys
    key2row[final_keys[realf]] = np.nonzero(realf)[0]

    with _timed_stage("plan_upload"):
        ups = [(slot_edge, np.int32), (slot_key, np.int32),
               (row_key_dev, np.int32), (key2row, np.int32),
               (slot_valid, np.float32)]
        if s2_gather_np is not None:
            ups += [(s2_gather_np, np.int32), (s2_valid_np, np.float32)]
        dev = _batch_device_put(ups)
        plan = ReducePlan(
            slot_edge=dev[0],
            slot_valid=dev[4],
            slot_key=dev[1],
            row_key=dev[2],
            s2_gather=dev[5] if s2_gather_np is not None else None,
            s2_valid=dev[6] if s2_gather_np is not None else None,
            key2row=dev[3],
            buckets1=tuple(buckets1),
            buckets2=buckets2,
            num_keys=num_keys,
        )
    # host mirrors: consumers (build_fast_graph, the distributed
    # builders) read the slot arrays back on the host — over the
    # tunneled TPU runtime those fetches cost ~1 s each at arxiv scale
    _register_plan_mirror(plan, dict(slot_edge=slot_edge,
                                     slot_valid=slot_valid))
    return plan


# ======================================================================
# FastGraph: GraphBatch + forward/backward plans
# ======================================================================

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FastGraph:
    """A :class:`GraphBatch` augmented with ELL plans for the fast path.

    ``dst_plan`` reduces messages to dst nodes (forward); ``src_plan``
    reduces cotangents to src nodes (backward of the ek gather);
    ``src_slot_from_dst_slot`` permutes dst-slot cotangents into src-slot
    order; ``edge2dst_slot`` recovers per-edge values (edge-feature grads).
    """

    graph: GraphBatch
    dst_plan: ReducePlan
    src_plan: ReducePlan
    dst_slot_srcnode: jax.Array     # [S_dst] src node id per dst slot
    src_slot_dstnode: jax.Array     # [S_src] dst node id per src slot
    src_slot_from_dst_slot: jax.Array  # [S_src] dst-slot index per src slot
    edge2dst_slot: jax.Array        # [E_pad] dst-slot index per sorted edge
    edge2src_slot: jax.Array        # [E_pad] src-slot index per sorted edge
    # Static per-slot scales (agg_type -> [S] f32, slot_valid folded in),
    # precomputed host-side so the hot path never pays the per-edge scalar
    # take (~20ms/step at arxiv scale — tools/microbench2.py). None when
    # built with static_scales=() or consumed via a dynamic edge mask.
    dst_slot_scales: Optional[dict]
    src_slot_scales: Optional[dict]

    # GraphBatch conveniences so layers can treat FastGraph as a graph
    @property
    def n_pad(self):
        return self.graph.n_pad

    @property
    def e_pad(self):
        return self.graph.e_pad

    @property
    def g_pad(self):
        return self.graph.g_pad

    @property
    def node_mask(self):
        return self.graph.node_mask

    @property
    def edge_mask(self):
        return self.graph.edge_mask

    @property
    def graph_mask(self):
        return self.graph.graph_mask

    @property
    def node2graph(self):
        return self.graph.node2graph

    @property
    def in_deg(self):
        return self.graph.in_deg

    @property
    def out_deg(self):
        return self.graph.out_deg

    @property
    def src(self):
        return self.graph.src

    @property
    def dst(self):
        return self.graph.dst

    @property
    def edge_perm(self):
        return self.graph.edge_perm

    @property
    def row_ptr(self):
        return self.graph.row_ptr

    def batch_num_nodes(self):
        return self.graph.batch_num_nodes()

    def broadcast_nodes(self, gfeat):
        return self.graph.broadcast_nodes(gfeat)

    def in_degrees(self):
        return self.graph.in_deg

    def out_degrees(self):
        return self.graph.out_deg


def static_edge_scale(agg: str, src, dst, valid, in_deg, out_deg
                      ) -> np.ndarray:
    """Host-side canonical per-edge scale for one aggregation type
    (f64 — the single source of truth shared by the single-device,
    sharded and halo fast paths; matching ``message_passing`` semantics:
    sum -> edge validity; mean -> validity / clamp(in_deg[dst], 1), the
    division folded in; sym -> clamp-deg^-1/2 norms per conv.py:51-57)."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    vf = np.asarray(valid, np.float64)
    in_deg = np.asarray(in_deg, np.float64)
    out_deg = np.asarray(out_deg, np.float64)
    if agg == "sum":
        return vf
    if agg == "mean":
        return vf / np.maximum(in_deg, 1.0)[dst]
    if agg == "sym":
        return vf * (np.maximum(out_deg, 1.0) ** -0.5)[src] * (
            np.maximum(in_deg, 1.0) ** -0.5)[dst]
    raise ValueError(f"unknown static scale agg {agg}")


# Two entries: a harness typically alternates between at most a train
# graph and an eval graph. Keys include a 128-bit content hash of
# (src, dst, edge_mask); entries hold device arrays, so keep this small.
_FAST_GRAPH_MEMO: dict = {}
_FAST_GRAPH_MEMO_MAX = 2


def build_fast_graph(graph: GraphBatch,
                     max_budget: int = MAX_BUDGET,
                     static_scales: tuple = ("sum", "mean", "sym"),
                     ) -> FastGraph:
    """Host-side: attach ELL plans to a GraphBatch.

    ``static_scales`` selects which aggregation types get precomputed
    per-slot scale arrays (matching ``message_passing`` semantics exactly:
    sum -> edge validity; mean -> validity / clamp(in_deg[dst], 1), the
    division folded in; sym -> clamp-deg^-1/2 norms per conv.py:51-57).
    """
    from ..graph import host_array

    reset_plan_timings()
    with _timed_stage("fetch_host"):
        src32 = host_array(graph, "src")
        dst32 = host_array(graph, "dst")
        valid = np.asarray(host_array(graph, "edge_mask"), bool)
        in_deg = host_array(graph, "in_deg")
        out_deg = host_array(graph, "out_deg")
    n = graph.n_pad

    # Content-keyed memo: the experiment harnesses rebuild the SAME graph
    # once per --nruns run (reference analog: create_formats_() paid once,
    # benchmark-datasets/ogbn-arxiv/train.py:55). Plans depend on the
    # structure arrays + DEGREES (host_array supports sliced/deserialized
    # GraphBatches whose degrees need not derive from src/dst — the static
    # scales bake them in, so they must key the memo) + build options.
    with _timed_stage("memo_hash"):
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        h.update(np.ascontiguousarray(src32).tobytes())
        h.update(np.ascontiguousarray(dst32).tobytes())
        h.update(np.ascontiguousarray(valid).tobytes())
        h.update(np.ascontiguousarray(in_deg).tobytes())
        h.update(np.ascontiguousarray(out_deg).tobytes())
        key = (h.hexdigest(), n, graph.e_pad, max_budget,
               tuple(static_scales))
    hit = _FAST_GRAPH_MEMO.get(key)
    if hit is not None:
        global _LAST_MEMO_HIT
        _LAST_MEMO_HIT = True
        return dataclasses.replace(hit, graph=graph)

    src = np.asarray(src32, np.int64)
    dst = np.asarray(dst32, np.int64)

    dst_plan = build_reduce_plan(dst, valid, n, max_budget)
    src_plan = build_reduce_plan(src, valid, n, max_budget)

    with _timed_stage("fetch_plans"):
        dst_slot_edge = np.asarray(plan_host_array(dst_plan, "slot_edge"),
                                   np.int64)
        src_slot_edge = np.asarray(plan_host_array(src_plan, "slot_edge"),
                                   np.int64)
        dvalid = plan_host_array(dst_plan, "slot_valid") > 0
        svalid = plan_host_array(src_plan, "slot_valid") > 0
    with _timed_stage("fg_host"):
        dst_slot_srcnode = src[dst_slot_edge]
        src_slot_dstnode = dst[src_slot_edge]

        edge2dst_slot = np.zeros(graph.e_pad, np.int64)
        edge2dst_slot[dst_slot_edge[dvalid]] = np.nonzero(dvalid)[0]
        src_slot_from_dst_slot = edge2dst_slot[src_slot_edge]

        edge2src_slot = np.zeros(graph.e_pad, np.int64)
        edge2src_slot[src_slot_edge[svalid]] = np.nonzero(svalid)[0]

    dst_scales_np = src_scales_np = None
    if static_scales:
        with _timed_stage("scales_host"):
            base = {agg: static_edge_scale(agg, src, dst, valid,
                                           in_deg, out_deg)
                    for agg in static_scales}
            dsv = dvalid.astype(np.float64)
            ssv = svalid.astype(np.float64)
            dst_scales_np = {
                a: (b[dst_slot_edge] * dsv).astype(np.float32)
                for a, b in base.items()}
            src_scales_np = {
                a: (b[src_slot_edge] * ssv).astype(np.float32)
                for a, b in base.items()}

    with _timed_stage("fg_upload"):
        ups = [(dst_slot_srcnode, np.int32),
               (src_slot_dstnode, np.int32),
               (src_slot_from_dst_slot, np.int32),
               (edge2dst_slot, np.int32),
               (edge2src_slot, np.int32)]
        scale_keys = []
        if static_scales:
            for a, v in dst_scales_np.items():
                scale_keys.append(("dst", a))
                ups.append((v, np.float32))
            for a, v in src_scales_np.items():
                scale_keys.append(("src", a))
                ups.append((v, np.float32))
        dev = _batch_device_put(ups)
        dst_scales = src_scales = None
        if static_scales:
            dst_scales, src_scales = {}, {}
            for (side, a), arr in zip(scale_keys, dev[5:]):
                (dst_scales if side == "dst" else src_scales)[a] = arr
        fg = FastGraph(
            graph=graph,
            dst_plan=dst_plan,
            src_plan=src_plan,
            dst_slot_srcnode=dev[0],
            src_slot_dstnode=dev[1],
            src_slot_from_dst_slot=dev[2],
            edge2dst_slot=dev[3],
            edge2src_slot=dev[4],
            dst_slot_scales=dst_scales,
            src_slot_scales=src_scales,
        )
    while len(_FAST_GRAPH_MEMO) >= _FAST_GRAPH_MEMO_MAX:
        _FAST_GRAPH_MEMO.pop(next(iter(_FAST_GRAPH_MEMO)))
    _FAST_GRAPH_MEMO[key] = fg
    return fg


# ======================================================================
# The fused SIR aggregation with scatter-free custom VJP
# ======================================================================

def _bucket_offsets(buckets):
    """(slot_offset, row_offset) runs for each (budget, nrows) bucket."""
    offs, s, r = [], 0, 0
    for b, nr in buckets:
        offs.append((b, nr, s, r))
        s += b * nr
        r += nr
    return offs


_EDGE_COT_CHUNKS = 0  # 0 = auto (chunk above _EDGE_COT_AUTO_EDGES)
_EDGE_COT_AUTO_EDGES = 1_000_000


def set_edge_cotangent_chunks(n: int) -> None:
    """Split the backward's [E_pad, H] edge-cotangent reconstruction
    (``take(g_z, edge2slot) * mask``) into ``n`` sequential lax.map
    chunks. Default 0 = auto: one op below 1M padded edges, 16/8/4/2
    chunks (largest dividing E_pad) above. Measured at 2.5M edges x
    H=128 on a v5e (tools/edge_compile_probe.py): chunking cuts the
    single-step compile 89.5 -> 67.9 s and the step 127.5 -> 121.0
    ms/iter — the smaller ops schedule better and never regress.
    ``n=1`` forces the single-op form.

    The setting is read at TRACE time: it takes effect on the next
    trace/compile, and functions that are already jit-compiled keep
    their prior chunking (jit caches are not keyed on it)."""
    global _EDGE_COT_CHUNKS
    assert n >= 0
    _EDGE_COT_CHUNKS = int(n)


def _auto_chunks(e_pad: int) -> int:
    if e_pad <= _EDGE_COT_AUTO_EDGES:
        return 1
    for c in (16, 8, 4, 2):
        if e_pad % c == 0:
            return c
    return 1


def _edge_cotangent(g_z, edge2slot, edge_mask, dtype=jnp.float32):
    """[E_pad, H] per-edge cotangent in sorted-edge order from the
    per-slot cotangent table: ``take(g_z, edge2slot) * edge_mask``,
    optionally chunked (see :func:`set_edge_cotangent_chunks`)."""
    maskf = edge_mask.astype(dtype)
    e_pad = edge2slot.shape[0]
    chunks = _EDGE_COT_CHUNKS or _auto_chunks(e_pad)
    if chunks <= 1 or e_pad % chunks != 0:
        return (jnp.take(g_z, edge2slot, axis=0).astype(dtype)
                * maskf[:, None])
    idx = edge2slot.reshape(chunks, e_pad // chunks)
    msk = maskf.reshape(chunks, e_pad // chunks)
    rows = jax.lax.map(
        lambda im: jnp.take(g_z, im[0], axis=0).astype(dtype)
        * im[1][:, None],
        (idx, msk))
    return rows.reshape(e_pad, -1)


def make_ell_sir_aggregate_pallas(
    fg: FastGraph,
    activation: Callable[[jax.Array], jax.Array],
    agg_type: str,
    with_edge: bool = False,
    interpret: bool = False,
    edge_dtype=None,
    remat: bool = False,
    act_elementwise: bool = True,
    static_scale: bool = False,
    fuse_bwd_take: bool = False,
):
    """Pallas-kernel variant of :func:`make_ell_sir_aggregate`: the
    broadcast+activation+reduce stages run as fused streaming kernels per
    budget bucket (see ``ops/pallas/kernels.py``); gathers stay on XLA's
    ``take``. ``edge_dtype=jnp.bfloat16`` halves the edge-pipeline HBM
    traffic (gathered operands carried in bf16, all accumulation f32) —
    the framework's AMP analog for the message-passing hot path.

    Backward design (measured on v5e — tools/gather_probe2.py): row takes
    from node-sized tables run ~3x faster than from slot-sized tables, so
    the backward NEVER touches a slot-sized table:

    * g_ek is recomputed **src-major**: gather eq[dst_e] and the output
      cotangent g[dst_e] per src slot from node tables, broadcast ek rows,
      run the activation VJP in-kernel, reduce by src (``bucket_src_bwd``).
    * g_eq: for ELEMENTWISE activations the dst-side cotangent factorizes
      as g[u] * sum_e scale_e act'(z_e); the forward kernel emits that
      derivative mass as a second output (``bucket_bcast_act_reduce2``)
      and backward is a node-sized elementwise multiply. For general
      row-wise activations (``act_elementwise=False``) a dst-major
      ``bucket_geq_reduce`` pass over the saved gathered keys computes it
      exactly.

    Residuals are node-sized on the elementwise path by construction
    (``remat`` only matters for the general path, where it drops the saved
    slot-sized gather and re-gathers in backward).

    ``static_scale=True`` uses the FastGraph's precomputed per-slot scale
    arrays for ``agg_type`` (mean's degree division folded in) and ignores
    the runtime ``edge_scale`` argument — use when no dynamic edge mask
    (DropEdge) applies; it removes all per-edge scalar takes from the hot
    path."""
    assert agg_type in ("sum", "mean", "sym")
    from .pallas import (
        bucket_bcast_act_reduce,
        bucket_bcast_act_reduce2,
        bucket_geq_reduce,
        bucket_src_bwd,
        bucket_src_bwd_fused,
    )

    plan = fg.dst_plan
    splan = fg.src_plan
    offs_d = _bucket_offsets(plan.buckets1)
    offs_s = _bucket_offsets(splan.buckets1)
    if static_scale:
        assert fg.dst_slot_scales is not None and \
            agg_type in fg.dst_slot_scales, \
            "FastGraph built without static scales for this agg_type"

    def dst_scale(edge_scale):
        if static_scale:
            return fg.dst_slot_scales[agg_type]
        return plan.gather_edges(edge_scale) * plan.slot_valid

    def src_scale(edge_scale):
        if static_scale:
            return fg.src_slot_scales[agg_type]
        return splan.gather_edges(edge_scale) * splan.slot_valid

    def cast(x):
        return x.astype(edge_dtype) if edge_dtype is not None else x

    def add_cast(a, b):
        """a + b carried in the edge dtype, added in f32."""
        if edge_dtype is not None:
            return (a.astype(jnp.float32)
                    + b.astype(jnp.float32)).astype(edge_dtype)
        return a + b

    def dst_slot_inputs(eq, ek, e, edge_scale):
        ekg = jnp.take(cast(ek), fg.dst_slot_srcnode, axis=0)
        if with_edge:
            ekg = add_cast(ekg, plan.gather_edges(cast(e)))
        eq_rows = jnp.take(eq, plan.row_key, axis=0)
        return ekg, eq_rows, dst_scale(edge_scale)

    def fwd_rows(ekg, eq_rows, s):
        rows = []
        for b, nr, so, ro in offs_d:
            rows.append(bucket_bcast_act_reduce(
                ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                s[so:so + b * nr].reshape(nr, b), b, activation,
                interpret=interpret))
        return jnp.concatenate(rows) if len(rows) > 1 else rows[0]

    def fwd_rows2(ekg, eq_rows, s):
        rows, srows = [], []
        for b, nr, so, ro in offs_d:
            r, sr = bucket_bcast_act_reduce2(
                ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                s[so:so + b * nr].reshape(nr, b), b, activation,
                interpret=interpret)
            rows.append(r)
            srows.append(sr)
        cat = lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0]
        return cat(rows), cat(srows)

    def src_pass(eq, ek, e, edge_scale, g, need_gz: bool):
        """g_ek (and optionally per-slot g_z) via the src-major kernel.

        ``fuse_bwd_take=True`` collapses the two node-table takes
        (eq[dst_e], g[dst_e]) into ONE take of a lane-concatenated
        [N, 2H] table (``bucket_src_bwd_fused``; requires H % 128 == 0,
        no edge features). Default OFF: tools/gather_probe3.py measured
        row takes at ~3.9 ns/row for tables <=44 MB but 13-15 ns/row at
        [N, 256] bf16 (87 MB — spills the chip's random-access-friendly
        cache), so at arxiv scale one 512 B-row take costs ~2x two
        256 B-row takes. Kept for narrower models where 2H stays
        <=128 lanes after padding."""
        h = eq.shape[-1]
        fuse = fuse_bwd_take and (h % 128 == 0) and not with_edge
        ek_rows = jnp.take(ek, splan.row_key, axis=0)
        s = src_scale(edge_scale)
        gz_dt = (edge_dtype or jnp.float32) if need_gz else None
        rows, gzs = [], []
        if fuse:
            tbl = jnp.concatenate([cast(eq), cast(g)], axis=1)
            both = jnp.take(tbl, fg.src_slot_dstnode, axis=0)
            for b, nr, so, ro in offs_s:
                r, gz = bucket_src_bwd_fused(
                    both[so:so + b * nr], ek_rows[ro:ro + nr],
                    s[so:so + b * nr].reshape(nr, b), b, activation,
                    interpret=interpret, gz_dtype=gz_dt)
                rows.append(r)
                gzs.append(gz)
        else:
            eqg = jnp.take(cast(eq), fg.src_slot_dstnode, axis=0)
            if with_edge:
                eqg = add_cast(eqg, splan.gather_edges(cast(e)))
            gg = jnp.take(cast(g), fg.src_slot_dstnode, axis=0)
            for b, nr, so, ro in offs_s:
                r, gz = bucket_src_bwd(
                    eqg[so:so + b * nr], ek_rows[ro:ro + nr],
                    s[so:so + b * nr].reshape(nr, b),
                    gg[so:so + b * nr], b, activation,
                    interpret=interpret, gz_dtype=gz_dt)
                rows.append(r)
                gzs.append(gz)
        cat = lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0]
        g_ek = splan.finalize_rows_sum(cat(rows))
        if need_gz:
            g_z = cat(gzs)
            g_e = _edge_cotangent(g_z, fg.edge2src_slot, fg.edge_mask)
        else:
            g_e = jnp.zeros((0,), jnp.float32)
        return g_ek, g_e

    @jax.custom_vjp
    def f(eq, ek, e, edge_scale):
        ekg, eq_rows, s = dst_slot_inputs(eq, ek, e, edge_scale)
        return plan.finalize_rows_sum(fwd_rows(ekg, eq_rows, s))

    if act_elementwise:
        def f_fwd(eq, ek, e, edge_scale):
            ekg, eq_rows, s = dst_slot_inputs(eq, ek, e, edge_scale)
            rows, srows = fwd_rows2(ekg, eq_rows, s)
            out = plan.finalize_rows_sum(rows)
            sbar = plan.finalize_rows_sum(srows)  # [N,H] deriv mass
            return out, (eq, ek, e, edge_scale, sbar)

        def f_bwd(res, g):
            eq, ek, e, edge_scale, sbar = res
            g_eq = g * sbar
            g_ek, g_e = src_pass(eq, ek, e, edge_scale, g, with_edge)
            return (g_eq, g_ek, g_e,
                    jnp.zeros((fg.e_pad,), jnp.float32))

        f.defvjp(f_fwd, f_bwd)

        def padded(eq, ek, e, edge_scale):
            """Pad the feature dim to a lane multiple (128) with zero
            columns: cost-free (the HBM tiled layout already pads the
            minor dim), exact for elementwise sigma (padded z columns
            never influence real ones), and it makes the fused
            [N, 2H] backward gather applicable at any model width —
            reference configs use h=95/96 (arxiv model 98,745 params)."""
            h = eq.shape[-1]
            hp = _round_up(h, 128)
            if hp == h:
                return f(eq, ek, e, edge_scale)
            pad = lambda x: jnp.pad(x, ((0, 0), (0, hp - h)))
            out = f(pad(eq), pad(ek),
                    pad(e) if (with_edge and e.ndim == 2) else e,
                    edge_scale)
            return out[:, :h]

        return padded
    else:
        def f_fwd(eq, ek, e, edge_scale):
            ekg, eq_rows, s = dst_slot_inputs(eq, ek, e, edge_scale)
            out = plan.finalize_rows_sum(fwd_rows(ekg, eq_rows, s))
            if remat:
                return out, (eq, ek, e, edge_scale)
            return out, (eq, ek, e, edge_scale, ekg, eq_rows, s)

        def f_bwd(res, g):
            if remat:
                eq, ek, e, edge_scale = res
                ekg, eq_rows, s = dst_slot_inputs(eq, ek, e, edge_scale)
            else:
                eq, ek, e, edge_scale, ekg, eq_rows, s = res
            g_rows1 = jnp.take(g, plan.row_key, axis=0)
            parts = []
            for b, nr, so, ro in offs_d:
                parts.append(bucket_geq_reduce(
                    ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                    s[so:so + b * nr].reshape(nr, b),
                    g_rows1[ro:ro + nr], b, activation,
                    interpret=interpret))
            g_eqr = (jnp.concatenate(parts) if len(parts) > 1
                     else parts[0])
            g_eq = plan.finalize_rows_sum(g_eqr)
            g_ek, g_e = src_pass(eq, ek, e, edge_scale, g, with_edge)
            return (g_eq, g_ek, g_e,
                    jnp.zeros((fg.e_pad,), jnp.float32))

    f.defvjp(f_fwd, f_bwd)
    return f


def make_ell_sir_aggregate(
    fg: FastGraph,
    activation: Callable[[jax.Array], jax.Array],
    agg_type: str,
    with_edge: bool = False,
    remat: bool = False,
    static_scale: bool = False,
):
    """Build the fast-path linear-agg SIR aggregation for a fixed graph:

        out[u] = reduce_{e in in(u)} scale_e * act(eq[u] + ek[src_e] [+ e_e])

    for agg in {sum, mean, sym}. Returns
    ``f(eq, ek, e, edge_scale) -> [N_pad, H]`` where ``edge_scale``
    [E_pad] carries the dynamic per-edge factor (sym norms, mean 1/deg,
    DropEdge mask) and ``e`` is the edge projection in sorted order (or
    None). Differentiable wrt eq/ek/e via a scatter-free custom VJP;
    ``edge_scale`` is treated as NON-differentiable (it derives from graph
    degrees and masks in every caller).
    """
    assert agg_type in ("sum", "mean", "sym")
    plan = fg.dst_plan
    if static_scale:
        assert fg.dst_slot_scales is not None and \
            agg_type in fg.dst_slot_scales

    def slot_scale(edge_scale):
        if static_scale:
            return fg.dst_slot_scales[agg_type]
        return plan.gather_edges(edge_scale) * plan.slot_valid

    def slot_z(eq, ek, e):
        z = plan.spread(eq) + jnp.take(ek, fg.dst_slot_srcnode, axis=0)
        if with_edge:
            z = z + plan.gather_edges(e)
        return z

    def fwd_compute(eq, ek, e, edge_scale):
        z = slot_z(eq, ek, e)
        m = activation(z)
        s = slot_scale(edge_scale)
        out = plan.reduce_slots_sum(m * s[:, None])
        return out, (z, s)

    @jax.custom_vjp
    def f(eq, ek, e, edge_scale):
        return fwd_compute(eq, ek, e, edge_scale)[0]

    def f_fwd(eq, ek, e, edge_scale):
        out, (z, s) = fwd_compute(eq, ek, e, edge_scale)
        if remat:
            return out, (eq, ek, e, edge_scale)
        return out, (z, s)

    def f_bwd(res, g):
        if remat:
            eq, ek, e, edge_scale = res
            z = slot_z(eq, ek, e)
            s = slot_scale(edge_scale)
        else:
            z, s = res
        # dL/dm_slot = spread(g); dL/dz = that * scale * act'(z)
        g_m = plan.spread(g) * s[:, None]
        _, act_vjp = jax.vjp(activation, z)
        (g_z,) = act_vjp(g_m)
        # d eq: reduce g_z by dst — g_z already in dst-slot order
        g_eq = plan.reduce_slots_sum(g_z * plan.slot_valid[:, None])
        # d ek: permute to src-slot order, reduce by src
        g_z_src = (jnp.take(g_z, fg.src_slot_from_dst_slot, axis=0)
                   * fg.src_plan.slot_valid[:, None])
        g_ek = fg.src_plan.reduce_slots_sum(g_z_src)
        # d e: per-edge cotangent in sorted-edge order
        if with_edge:
            g_e = _edge_cotangent(g_z, fg.edge2dst_slot, fg.edge_mask)
        else:
            g_e = jnp.zeros((0,), jnp.float32)
        return (g_eq, g_ek, g_e,
                jnp.zeros((fg.e_pad,), jnp.float32))

    f.defvjp(f_fwd, f_bwd)
    return f


def make_ell_sir_aggregate_max(
    fg: FastGraph,
    activation: Callable[[jax.Array], jax.Array],
    with_edge: bool = False,
):
    """Scatter-free max-aggregation path (SURVEY N2: the per-edge W_R GEMM
    before the reduce — ``models/conv.py:47``):

        out[u] = max_e act(eq[u] + ek[src_e] [+ e_e]) @ W_R + b

    The [S, H] x [H, O] per-slot matmul runs on the MXU; the reduce is the
    bucketed reshape-max; empty nodes zero-fill (DGL semantics). Backward
    routes cotangents through the argmax slots (ties split equally) with
    the same take/reduce vocabulary as the linear path — no scatter.
    """
    plan = fg.dst_plan
    splan = fg.src_plan

    def slot_pre(eq, ek, e):
        z = plan.spread(eq) + jnp.take(ek, fg.dst_slot_srcnode, axis=0)
        if with_edge:
            z = z + plan.gather_edges(e)
        return z

    def fwd_compute(eq, ek, e, edge_scale, w, b):
        z = slot_pre(eq, ek, e)
        m = activation(z) @ w
        if b is not None:
            m = m + b
        valid = (plan.gather_edges(edge_scale) * plan.slot_valid) > 0
        neg = jnp.finfo(m.dtype).min
        mv = jnp.where(valid[:, None], m, neg)
        out = plan.reduce_slots_max(mv)
        has_any = plan.reduce_slots_sum(
            valid.astype(m.dtype)[:, None]) > 0
        out = jnp.where(has_any & (out > neg / 2), out, 0.0)
        return out, (mv, valid)

    @jax.custom_vjp
    def f(eq, ek, e, edge_scale, w, b):
        return fwd_compute(eq, ek, e, edge_scale, w, b)[0]

    def f_fwd(eq, ek, e, edge_scale, w, b):
        out, (mv, valid) = fwd_compute(eq, ek, e, edge_scale, w, b)
        return out, (eq, ek, e, edge_scale, w, b, out, valid)

    def f_bwd(res, g):
        eq, ek, e, edge_scale, w, b, out, valid = res
        # recompute slot pre-activations and activations
        z = slot_pre(eq, ek, e)
        a = activation(z)
        m = a @ w
        if b is not None:  # forward supports b=None; mirror it here
            m = m + b
        # winner mask per (slot, o); ties split equally
        out_s = plan.spread(out)
        win = (jnp.abs(m - out_s) <= 0) & valid[:, None]
        win = win.astype(m.dtype)
        counts = plan.reduce_slots_sum(win)
        g_m = plan.spread(g / jnp.maximum(counts, 1.0)) * win

        g_b = jnp.sum(g_m, axis=0) if b is not None else None
        g_w = a.T @ g_m
        g_a = g_m @ w.T
        _, act_vjp = jax.vjp(activation, z)
        (g_z,) = act_vjp(g_a)
        g_z = g_z * plan.slot_valid[:, None]

        g_eq = plan.reduce_slots_sum(g_z)
        g_z_src = (jnp.take(g_z, fg.src_slot_from_dst_slot, axis=0)
                   * splan.slot_valid[:, None])
        g_ek = splan.reduce_slots_sum(g_z_src)
        if with_edge:
            g_e = _edge_cotangent(g_z, fg.edge2dst_slot, fg.edge_mask,
                                  dtype=g_z.dtype)
        else:
            g_e = jnp.zeros((0,), g_z.dtype)
        return (g_eq, g_ek, g_e, jnp.zeros((fg.e_pad,), g_z.dtype),
                g_w, g_b)

    f.defvjp(f_fwd, f_bwd)
    return f


def make_ell_sir_aggregate_pallas_fused_edge(
    fg: FastGraph,
    activation: Callable[[jax.Array], jax.Array],
    agg_type: str,
    interpret: bool = False,
    edge_dtype=None,
    static_scale: bool = False,
):
    """Fused-edge Pallas path for SIREConv at scale (VERDICT r4 item 1a).

    ``f(eq, ek, e_basis, w_e, edge_scale) -> [N_pad, H]`` computes

        out[u] = reduce_e scale_e * act(eq[u] + ek[src_e] + e_basis_e @ w_e)

    for elementwise sigma and linear agg — the reference SIREConv with its
    ``linear_edge`` (``models/conv.py:70-134``) folded INTO the aggregate.
    ``e_basis`` [E_pad, De] (sorted edge order) is whatever the edge
    encoder is affine in: raw float features for the default Linear, a
    one-hot of bond types for the Embedding encoder (SIREConv2).

    Vs the generic ``with_edge=True`` path this removes every wide edge
    stream: the forward gathers the narrow [S, De] basis and runs the
    projection on the MXU inside the kernel; the backward accumulates
    g_we = sum_s basis_s^T g_z_s in-kernel and NEVER materializes the
    [E_pad, H] per-edge cotangent whose unslice XLA schedules
    pathologically at full-graph scale (ROADMAP round 4: 90-170 s
    compiles, ~2x step cost). e_basis itself gets no gradient (it is
    input data in every caller; declared zero).
    """
    assert agg_type in ("sum", "mean", "sym")
    from .pallas import bucket_edge_act_reduce2, bucket_edge_src_bwd

    plan = fg.dst_plan
    splan = fg.src_plan
    offs_d = _bucket_offsets(plan.buckets1)
    offs_s = _bucket_offsets(splan.buckets1)
    if static_scale:
        assert fg.dst_slot_scales is not None and \
            agg_type in fg.dst_slot_scales

    def dst_scale(edge_scale):
        if static_scale:
            return fg.dst_slot_scales[agg_type]
        return plan.gather_edges(edge_scale) * plan.slot_valid

    def src_scale(edge_scale):
        if static_scale:
            return fg.src_slot_scales[agg_type]
        return splan.gather_edges(edge_scale) * splan.slot_valid

    def cast(x):
        return x.astype(edge_dtype) if edge_dtype is not None else x

    def pad_basis(e_basis):
        de = e_basis.shape[1]
        dp = max(_round_up(de, 8), 8)
        if dp == de:
            return e_basis
        return jnp.pad(e_basis, ((0, 0), (0, dp - de)))

    @jax.custom_vjp
    def f(eq, ek, e_basis, w_e, edge_scale):
        out, _ = f_fwd(eq, ek, e_basis, w_e, edge_scale)
        return out

    def f_fwd(eq, ek, e_basis, w_e, edge_scale):
        eb = pad_basis(e_basis)
        we = jnp.pad(w_e, ((0, eb.shape[1] - w_e.shape[0]), (0, 0)))
        ekg = jnp.take(cast(ek), fg.dst_slot_srcnode, axis=0)
        egr = plan.gather_edges(eb)
        eq_rows = jnp.take(eq, plan.row_key, axis=0)
        s = dst_scale(edge_scale)
        rows, srows = [], []
        for b, nr, so, ro in offs_d:
            r, sr = bucket_edge_act_reduce2(
                ekg[so:so + b * nr], egr[so:so + b * nr],
                eq_rows[ro:ro + nr], s[so:so + b * nr].reshape(nr, b),
                we, b, activation, interpret=interpret)
            rows.append(r)
            srows.append(sr)
        cat = lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0]
        out = plan.finalize_rows_sum(cat(rows))
        sbar = plan.finalize_rows_sum(cat(srows))
        return out, (eq, ek, e_basis, w_e, edge_scale, sbar)

    def f_bwd(res, g):
        eq, ek, e_basis, w_e, edge_scale, sbar = res
        g_eq = g * sbar
        eb = pad_basis(e_basis)
        we = jnp.pad(w_e, ((0, eb.shape[1] - w_e.shape[0]), (0, 0)))
        eqg = jnp.take(cast(eq), fg.src_slot_dstnode, axis=0)
        egr = splan.gather_edges(eb)
        ek_rows = jnp.take(ek, splan.row_key, axis=0)
        gg = jnp.take(cast(g), fg.src_slot_dstnode, axis=0)
        s = src_scale(edge_scale)
        rows, gwes = [], []
        for b, nr, so, ro in offs_s:
            r, gwe = bucket_edge_src_bwd(
                eqg[so:so + b * nr], egr[so:so + b * nr],
                ek_rows[ro:ro + nr], s[so:so + b * nr].reshape(nr, b),
                gg[so:so + b * nr], we, b, activation,
                interpret=interpret)
            rows.append(r)
            gwes.append(gwe)
        cat = lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0]
        g_ek = splan.finalize_rows_sum(cat(rows))
        g_we = sum(gwes)[:w_e.shape[0]]
        return (g_eq, g_ek, jnp.zeros_like(e_basis), g_we,
                jnp.zeros((fg.e_pad,), jnp.float32))

    f.defvjp(f_fwd, f_bwd)

    def padded(eq, ek, e_basis, w_e, edge_scale):
        """Lane-pad the hidden dim to 128 with zero columns (exact for
        elementwise sigma; zero w_e columns contribute nothing)."""
        h = eq.shape[-1]
        hp = _round_up(h, 128)
        if hp == h:
            return f(eq, ek, e_basis, w_e, edge_scale)
        pad = lambda x: jnp.pad(x, ((0, 0), (0, hp - h)))
        out = f(pad(eq), pad(ek), e_basis, pad(w_e), edge_scale)
        return out[:, :h]

    return padded


def make_ell_sir_aggregate_max_pallas(
    fg: FastGraph,
    activation: Callable[[jax.Array], jax.Array],
    with_edge: bool = False,
    interpret: bool = False,
    edge_dtype=None,
):
    """Pallas-kernel max-aggregation path (VERDICT r4 item 1b): the
    per-edge W_R GEMM (reference ``models/conv.py:47``) runs on the MXU
    *inside* fused bucket kernels instead of the ~10 slot-sized XLA
    streams of :func:`make_ell_sir_aggregate_max` (measured 108.89
    ms/iter at arxiv scale, ~8x the linear path — ROADMAP).

    Same signature/semantics as the XLA builder: zero-fill for empty
    nodes, cotangents split equally over tied winners (two recompute
    passes: win-count, then grad routing with in-kernel g_W
    accumulation). The single remaining slot-sized op is the g_z
    dst->src permute for g_ek.
    """
    from .pallas import (
        bucket_max_gemm_bwd,
        bucket_max_gemm_fwd,
        bucket_max_wincount,
        bucket_scaled_reduce,
    )

    plan = fg.dst_plan
    splan = fg.src_plan
    offs_d = _bucket_offsets(plan.buckets1)
    offs_s = _bucket_offsets(splan.buckets1)
    NEG = float(jnp.finfo(jnp.float32).min)

    def cast(x):
        return x.astype(edge_dtype) if edge_dtype is not None else x

    def slot_inputs(eq, ek, e, edge_scale):
        ekg = jnp.take(cast(ek), fg.dst_slot_srcnode, axis=0)
        if with_edge:
            ekg = ekg + plan.gather_edges(cast(e)).astype(ekg.dtype)
        eq_rows = jnp.take(eq, plan.row_key, axis=0)
        sval = plan.gather_edges(edge_scale) * plan.slot_valid
        return ekg, eq_rows, sval

    def fwd_max_rows(ekg, eq_rows, sval, w):
        rows = []
        for b, nr, so, ro in offs_d:
            rows.append(bucket_max_gemm_fwd(
                ekg[so:so + b * nr], eq_rows[ro:ro + nr],
                sval[so:so + b * nr].reshape(nr, b), w, b, activation,
                interpret=interpret))
        return jnp.concatenate(rows) if len(rows) > 1 else rows[0]

    @jax.custom_vjp
    def f(eq, ek, e, edge_scale, w, b):
        out, _ = f_fwd(eq, ek, e, edge_scale, w, b)
        return out

    def f_fwd(eq, ek, e, edge_scale, w, b):
        ekg, eq_rows, sval = slot_inputs(eq, ek, e, edge_scale)
        rows = fwd_max_rows(ekg, eq_rows, sval, w)
        out1 = plan._finalize(rows, "max", NEG)  # [N, O] pre-bias max
        # out1 > NEG/2 <=> some valid slot contributed (finite m); empty
        # nodes zero-fill per DGL semantics
        active = out1 > NEG / 2
        out = jnp.where(active, out1 + b, 0.0)
        return out, (eq, ek, e, edge_scale, w, out1, active)

    def f_bwd(res, g):
        eq, ek, e, edge_scale, w, out1, active = res
        ekg, eq_rows, sval = slot_inputs(eq, ek, e, edge_scale)
        or_rows = jnp.take(out1, plan.row_key, axis=0)
        cnts = []
        for bb, nr, so, ro in offs_d:
            cnts.append(bucket_max_wincount(
                ekg[so:so + bb * nr], eq_rows[ro:ro + nr],
                sval[so:so + bb * nr].reshape(nr, bb),
                or_rows[ro:ro + nr], w, bb, activation,
                interpret=interpret))
        cat = lambda xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0]
        counts = plan.finalize_rows_sum(cat(cnts))
        g_act = jnp.where(active, g, 0.0)
        gsc = g_act / jnp.maximum(counts, 1.0)
        gsc_rows = jnp.take(gsc, plan.row_key, axis=0)
        gz_dt = edge_dtype or jnp.float32
        geqs, gzs, gws = [], [], []
        for bb, nr, so, ro in offs_d:
            geq_r, g_z, g_w = bucket_max_gemm_bwd(
                ekg[so:so + bb * nr], eq_rows[ro:ro + nr],
                sval[so:so + bb * nr].reshape(nr, bb),
                or_rows[ro:ro + nr], gsc_rows[ro:ro + nr], w, bb,
                activation, interpret=interpret, gz_dtype=gz_dt)
            geqs.append(geq_r)
            gzs.append(g_z)
            gws.append(g_w)
        g_eq = plan.finalize_rows_sum(cat(geqs))
        g_z = cat(gzs)
        g_w = sum(gws)
        # one slot-sized permute: dst-slot cotangents -> src order
        g_z_src = jnp.take(g_z, fg.src_slot_from_dst_slot, axis=0)
        rows = []
        for bb, nr, so, ro in offs_s:
            rows.append(bucket_scaled_reduce(
                g_z_src[so:so + bb * nr],
                splan.slot_valid[so:so + bb * nr].reshape(nr, bb), bb,
                interpret=interpret))
        g_ek = splan.finalize_rows_sum(cat(rows))
        g_b = jnp.sum(g_act, axis=0)
        if with_edge:
            g_e = _edge_cotangent(g_z, fg.edge2dst_slot, fg.edge_mask,
                                  dtype=jnp.float32)
        else:
            g_e = jnp.zeros((0,), jnp.float32)
        return (g_eq, g_ek, g_e, jnp.zeros((fg.e_pad,), jnp.float32),
                g_w, g_b)

    f.defvjp(f_fwd, f_bwd)

    def padded(eq, ek, e, edge_scale, w, b):
        """Lane-pad H and O to 128 multiples with zeros (exact: padded z
        lanes are 0, padded w rows/cols contribute nothing; padded out
        columns are sliced away)."""
        h, o = w.shape
        hp, op = _round_up(h, 128), _round_up(o, 128)
        if hp == h and op == o:
            return f(eq, ek, e, edge_scale, w, b)
        padc = lambda x, p: jnp.pad(x, ((0, 0), (0, p - x.shape[1])))
        wp = jnp.pad(w, ((0, hp - h), (0, op - o)))
        out = f(padc(eq, hp), padc(ek, hp),
                padc(e, hp) if (with_edge and e.ndim == 2) else e,
                edge_scale, wp, jnp.pad(b, (0, op - o)))
        return out[:, :o]

    return padded


import collections
import logging

_routing_logger = logging.getLogger("sir_gcn_tpu.routing")

# LRU by (id(act), h): long-lived activations stay cached while per-trace
# closures are evicted one at a time (oldest first) — a bulk clear would
# force re-probing (two jacfwd traces + make_jaxpr) of everything.
_ELEMENTWISE_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_ELEMENTWISE_CACHE_MAX = 256


def activation_is_elementwise(act: Callable, h: int) -> bool:
    """Probe whether ``act`` has a diagonal Jacobian over the feature dim.

    Evaluated once per (activation object, width) on a tiny concrete
    input: the full ``jacfwd`` on a [2, h] probe must be elementwise-
    diagonal. Anything that raises — including activations closing over
    traced parameters (e.g. the DictionaryLookup MLP-augmented sigma,
    reference ``synthetic-datasets/dictionary-lookup/model.py:14-24``) —
    is conservatively reported non-elementwise, which routes the Pallas
    backward onto the exact general (row-wise) path."""
    return _activation_info(act, h)[0]


def activation_pallas_compatible(act: Callable, h: int) -> bool:
    """Whether ``act`` can run inside a Pallas kernel: it must not close
    over array constants or traced values (kernels cannot capture them —
    probed via ``jax.closure_convert``). Incompatible activations are
    routed to the pure-XLA ELL builder, which is still scatter-free."""
    return _activation_info(act, h)[1]


def _probe_inputs(h: int):
    """Several probe points: structured ramp plus seeded random draws at
    two magnitudes, so piecewise activations that happen to look diagonal
    at one input are still caught (the probe is a heuristic — set
    ``act.sir_elementwise = False`` to force the exact general path for
    adversarial activations)."""
    rng = np.random.default_rng(0)
    return [
        jnp.linspace(-2.0, 2.0, 2 * h, dtype=jnp.float32).reshape(2, h),
        jnp.asarray(rng.normal(size=(2, h)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, h)) * 10.0, jnp.float32),
    ]


def _jac_is_diagonal(act: Callable, z: jax.Array) -> bool:
    h = z.shape[1]
    jac = np.asarray(jax.jacfwd(act)(z), np.float64)
    if jac.shape != (2, h, 2, h):
        return False
    i = np.arange(2)[:, None]
    j = np.arange(h)[None, :]
    diag_mask = np.zeros(jac.shape, bool)
    diag_mask[i, j, i, j] = True
    off = np.abs(jac[~diag_mask]).max(initial=0.0)
    return bool(off <= 1e-6 * max(np.abs(jac).max(initial=0.0), 1e-30))


def _activation_info(act: Callable, h: int) -> tuple:
    key = (id(act), h)
    hit = _ELEMENTWISE_CACHE.get(key)
    # id() can be recycled after gc; revalidate with the stored ref.
    if hit is not None and hit[0] is act:
        _ELEMENTWISE_CACHE.move_to_end(key)
        return hit[1], hit[2]
    probes = _probe_inputs(h)
    override = getattr(act, "sir_elementwise", None)
    if override is not None:
        elem = bool(override)
    else:
        try:
            elem = all(_jac_is_diagonal(act, z) for z in probes)
        except Exception:
            elem = False
    try:
        # Pallas kernels cannot capture jaxpr constants (arrays or traced
        # values closed over by sigma) — pallas_call raises "captures
        # constants [...]"; such activations go to the XLA ELL builder.
        pallas_ok = not jax.make_jaxpr(act)(probes[0]).consts
    except Exception:
        pallas_ok = False
    _ELEMENTWISE_CACHE[key] = (act, elem, pallas_ok)
    while len(_ELEMENTWISE_CACHE) > _ELEMENTWISE_CACHE_MAX:
        _ELEMENTWISE_CACHE.popitem(last=False)
    # surface the routing decision (VERDICT r1 item 8): the probe is a
    # heuristic — an adversarial piecewise sigma that is diagonal at the
    # probe points but row-coupled elsewhere would be misrouted; set
    # ``act.sir_elementwise = False`` to force the exact general path.
    name = getattr(act, "__name__", None) or repr(act)
    route = ("pallas-elementwise" if (elem and pallas_ok)
             else "pallas-general" if pallas_ok
             else "xla-ell-builder")
    _routing_logger.info(
        "sigma routing: %s (h=%d) -> %s (elementwise=%s, "
        "pallas_compatible=%s, override=%s)",
        name, h, route, elem, pallas_ok, override)
    return elem, pallas_ok


def ell_sir_aggregate(fg: FastGraph, eq, ek, activation, agg_type,
                      e=None, edge_scale=None, use_pallas=None,
                      static_scale: bool = False):
    """One-shot convenience wrapper (the builder itself is cheap; the jit
    cache dedupes compiled code by jaxpr). ``use_pallas=None`` selects the
    fused kernels automatically on TPU backends. ``static_scale=True``
    consumes the FastGraph's precomputed per-slot scales for ``agg_type``
    (mean's degree division folded in) and ignores ``edge_scale`` — only
    valid when no dynamic edge mask applies."""
    if use_pallas is None:
        from .pallas import pallas_available
        use_pallas = pallas_available()
    from .message_passing import get_edge_dtype, get_remat

    if use_pallas:
        elem, pallas_ok = _activation_info(activation, eq.shape[-1])
        use_pallas = pallas_ok  # closure-capturing sigma -> XLA builder
    if use_pallas:
        f = make_ell_sir_aggregate_pallas(
            fg, activation, agg_type, with_edge=e is not None,
            edge_dtype=get_edge_dtype(), remat=get_remat(),
            act_elementwise=elem,
            static_scale=static_scale)
    else:
        f = make_ell_sir_aggregate(fg, activation, agg_type,
                                   with_edge=e is not None,
                                   remat=get_remat(),
                                   static_scale=static_scale)
    if edge_scale is None:
        edge_scale = fg.edge_mask.astype(eq.dtype)
    if e is None:
        e = jnp.zeros((0,), eq.dtype)  # placeholder, unused
    return f(eq, ek, e, edge_scale)


# ======================================================================
# Plan harmonization (for the distributed fast path)
# ======================================================================

def uniform_stage2(plans: list, rebuild_args: list) -> list:
    """Make a plan list stage-2-UNIFORM: if any plan has a hub second
    stage, rebuild the ones without (``rebuild_args[i]`` = the
    ``build_reduce_plan`` positional args); if none do, leave all
    stage-1-only. Harmonization requires uniformity — but forcing stage
    2 onto hub-free graphs costs an extra row-sized take+stream per
    finalize (measured ~1.6 ms/layer of the round-3 sharded@1 tax), so
    it is no longer unconditional."""
    if any(p.s2_gather is not None for p in plans):
        plans = [p if p.s2_gather is not None
                 else build_reduce_plan(*a, force_stage2=True)
                 for p, a in zip(plans, rebuild_args)]
    return plans


def harmonize_reduce_plans(plans: list) -> list:
    """Re-lay a list of :class:`ReducePlan` into a COMMON static structure
    (same buckets1/buckets2/row counts) so their array leaves can be
    stacked and consumed by one shard_map program. All plans must share
    ``num_keys`` and be stage-2-uniform: either all carry the hub second
    stage or none do (see :func:`uniform_stage2`).

    Padding rows/slots are zero-valid and never selected by key2row, so
    harmonized plans produce bit-identical reductions."""
    no_s2 = all(p.s2_gather is None for p in plans)
    assert no_s2 or all(p.s2_gather is not None for p in plans), \
        "mixed stage-2 plans; pass through uniform_stage2 first"
    num_keys = plans[0].num_keys
    assert all(p.num_keys == num_keys for p in plans)

    def common_buckets(get):
        # merge duplicate-budget entries within each plan, then take the
        # max row count per budget across plans
        per = []
        for p in plans:
            d = {}
            for b, nr in get(p):
                d[b] = d.get(b, 0) + nr
            per.append(d)
        budgets = sorted(set(b for d in per for b in d))
        return tuple((b, max(d.get(b, 0) for d in per)) for b in budgets)

    cb1 = common_buckets(lambda p: p.buckets1)
    cb2 = None if no_s2 else common_buckets(lambda p: p.buckets2)

    def relayout_stage(plan_buckets, cbuckets, arrays, pad_values):
        """arrays: per-slot np arrays laid out by the plan's (possibly
        duplicate-budget) bucket sequence. Returns arrays re-laid into the
        common sorted-unique bucket structure, plus old_row -> new_row
        map. Duplicate-budget buckets are merged in order of appearance."""
        # collect the plan's segments per budget, in sequence order
        seg_slots = {}   # budget -> list of (slot_start, nrows)
        s = r = 0
        row_spans = {}   # budget -> list of (row_start, nrows)
        for b, nr in plan_buckets:
            seg_slots.setdefault(b, []).append((s, nr))
            row_spans.setdefault(b, []).append((r, nr))
            s += b * nr
            r += nr
        outs = [[] for _ in arrays]
        n_old_rows = r
        rowmap = np.zeros(n_old_rows + 1, np.int64)
        new_r = 0
        for b, nrc in cbuckets:
            nrp_total = 0
            for (so, nrp), (ro, _) in zip(seg_slots.get(b, []),
                                          row_spans.get(b, [])):
                for ai, arr in enumerate(arrays):
                    outs[ai].append(arr[so:so + b * nrp])
                rowmap[ro:ro + nrp] = new_r + nrp_total + np.arange(nrp)
                nrp_total += nrp
            pad_rows = nrc - nrp_total
            for ai, (arr, padv) in enumerate(zip(arrays, pad_values)):
                outs[ai].append(np.full((b * pad_rows,) + arr.shape[1:],
                                        padv, arr.dtype))
            new_r += nrc
        rowmap[n_old_rows] = new_r  # sentinel (appended zero row)
        return [np.concatenate(o) for o in outs], rowmap, new_r

    out = []
    for p in plans:
        se = plan_host_array(p, "slot_edge")
        sv = plan_host_array(p, "slot_valid")
        sk = np.asarray(p.slot_key)
        rk = np.asarray(p.row_key)
        (se2, sv2, sk2), rowmap1, n_rows1 = relayout_stage(
            p.buckets1, cb1, [se, sv, sk], [0, 0.0, 0])
        # row_key is row-indexed: place via the row map
        rk2 = np.zeros(n_rows1, rk.dtype)
        rk2[rowmap1[:len(rk)]] = rk

        if no_s2:
            # key2row points straight at stage-1 rows (sentinel = the
            # appended fill row, mapped by rowmap1's last entry)
            k2r = rowmap1[np.asarray(p.key2row)]
            g2j = v2j = None
        else:
            g2 = rowmap1[np.asarray(p.s2_gather)]
            v2 = np.asarray(p.s2_valid)
            (g2n, v2n), rowmap2, n_rows2 = relayout_stage(
                p.buckets2, cb2, [g2, v2], [0, 0.0])
            k2r = rowmap2[np.asarray(p.key2row)]
            g2j = jnp.asarray(g2n, jnp.int32)
            v2j = jnp.asarray(v2n)

        out.append(ReducePlan(
            slot_edge=jnp.asarray(se2, jnp.int32),
            slot_valid=jnp.asarray(sv2),
            slot_key=jnp.asarray(sk2, jnp.int32),
            row_key=jnp.asarray(rk2, jnp.int32),
            s2_gather=g2j,
            s2_valid=v2j,
            key2row=jnp.asarray(k2r, jnp.int32),
            buckets1=cb1,
            buckets2=cb2,
            num_keys=num_keys,
        ))
    return out
