"""Boundary-only halo exchange for edge-partitioned full-graph SIR
aggregation (SURVEY §2c P3 — the graph analog of ring/context parallelism).

The ``ell_distributed`` fast path all-gathers the full ``ek`` projection
([N_pad, H]) on every shard. On real graphs each shard's incoming edges
reference only a *boundary* subset of remote nodes, so this module
exchanges exactly those rows with ``all_to_all`` instead:

  * host side, per (receiver r, sender s) pair: the unique remote src
    nodes u(r, s) shard r needs from shard s, padded to a common
    ``h_max`` so one static ``all_to_all`` carries every pair;
  * each shard's edges are split into **interior** (src owned locally)
    and **boundary** (src remote) sets with separate scatter-free
    :class:`~sir_gcn_tpu.ops.ell.ReducePlan`s. The interior aggregation
    has no data dependency on the collective, which lets XLA overlap it
    with the halo exchange (the double-buffering from SURVEY §2c P3).
    Evidence (tests/test_halo_overlap.py, from the compiled HLO rather
    than trust): the forward contains exactly ONE all_to_all whose
    per-device operand is the boundary table (n_shards x h_max rows —
    never an O(N_pad) collective), the backward exactly two (halo
    recompute + cotangent return), and the interior reduce consumes
    only local operands so the scheduler is free to run it during the
    exchange; actual concurrent execution on a multi-chip pod slice
    remains hardware-blocked here (single tunneled chip);
  * backward returns boundary cotangents with the transposed
    ``all_to_all``: reduce per (sender, slot) into the halo table, swap
    blocks back, then a scatter-free reduce keyed by the sent rows. No
    ``psum`` / ``psum_scatter`` over full node arrays anywhere.

Communication per layer: O(boundary rows x H) forward, 2x backward (one
halo recompute, one cotangent return) — vs O(N_pad x H) x3 for the
all-gather path. Unlike that path, this one also supports **dynamic
per-edge scales** (DropEdge masks, runtime renormalization): pass the
same [E_pad] scale array the single-device fast path consumes
(reference DropEdge: ``models/utils.py:96-102``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import GraphBatch
from ..ops.ell import ReducePlan, build_reduce_plan, harmonize_reduce_plans
from .ell_distributed import _stack_plans, _unstack_plan


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad8(x: int) -> int:
    return max(_round_up(x, 8), 8)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloFastGraph:
    """Stacked per-shard plans for the boundary-only halo fast path.

    All array leaves have a leading shard axis S. ``*_i`` plans cover
    interior edges (src owned by the shard), ``*_b`` boundary edges.
    The halo table holds ``n_shards * h_max`` rows: block s carries the
    rows received from shard s.
    """

    dst_plan_i: ReducePlan        # local dst keys over interior edges
    dst_plan_b: ReducePlan        # local dst keys over boundary edges
    src_plan_i: ReducePlan        # local src keys over interior edges
    halo_plan: ReducePlan         # halo-table keys over boundary edges
    ret_plan: ReducePlan          # local node keys over sent halo rows
    slot_src_local: jax.Array     # [S, S1i] local src per interior slot
    slot_src_halo: jax.Array      # [S, S1b] halo idx per boundary slot
    scale_i: jax.Array            # [S, S1i] static per-slot scale
    scale_b: jax.Array            # [S, S1b]
    src_from_dst_i: jax.Array     # [S, Ssi] interior dst-slot per src slot
    src_from_dst_b: jax.Array     # [S, Shb] boundary dst-slot per halo slot
    # node-table-major backward (Pallas variant): local dst id and static
    # scale laid out in src-plan / halo-plan slot order
    src_dstnode_i: jax.Array      # [S, Ssi]
    src_scale_i: jax.Array        # [S, Ssi]
    halo_dstnode: jax.Array       # [S, Shb]
    halo_scale: jax.Array         # [S, Shb]
    send_idx: jax.Array           # [S, S*Hmax] local rows to send
    edge_slice_idx: jax.Array     # [S, Emax] global edge id per local slot
    edge_slice_valid: jax.Array   # [S, Emax] 0/1
    # edge-feature support (SIREConv on the halo path): local-edge ->
    # dst-slot maps for both stages, interior membership, and the inverse
    # of the edge slicing (global edge -> shard*Emax + local pos)
    edge2dst_i: jax.Array         # [S, Emax] interior dst-slot per edge
    edge2dst_b: jax.Array         # [S, Emax] boundary dst-slot per edge
    edge_interior: jax.Array      # [S, Emax] 1.0 = valid interior edge
    edge_valid: jax.Array         # [S, Emax] 1.0 = valid (non-pad) edge
    edge_unslice: jax.Array       # [E_pad] global edge -> flat shard slot
    e_pad: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    n_local: int = dataclasses.field(metadata=dict(static=True))
    h_max: int = dataclasses.field(metadata=dict(static=True))
    e_max: int = dataclasses.field(metadata=dict(static=True))
    agg_type: str = dataclasses.field(metadata=dict(static=True))

    @property
    def halo_rows(self) -> int:
        return self.n_shards * self.h_max


def _slot_values(plan: ReducePlan, per_item: np.ndarray) -> np.ndarray:
    """Host: lay a per-item array into a plan's slot order (pad slots 0)."""
    se = np.asarray(plan.slot_edge)
    sv = np.asarray(plan.slot_valid) > 0
    out = np.zeros(plan.num_slots, per_item.dtype)
    if per_item.size:
        out[sv] = per_item[se[sv]]
    return out


def _dst_slot_of_edge(plan: ReducePlan, n_items: int) -> np.ndarray:
    """Host: item id -> its slot index in ``plan`` (items appear once)."""
    se = np.asarray(plan.slot_edge)
    sv = np.asarray(plan.slot_valid) > 0
    out = np.zeros(max(n_items, 1), np.int64)
    out[se[sv]] = np.nonzero(sv)[0]
    return out


def build_halo_fast_graph(
    graph: GraphBatch,
    n_shards: int,
    agg_type: str = "sum",
    max_budget: int = 256,
) -> HaloFastGraph:
    """Host-side: interior/boundary split plans + halo exchange schedule
    for a dst-sorted :class:`GraphBatch` over ``n_shards`` contiguous node
    ranges. ``agg_type`` folds the *static* per-edge scale ('sym' degree
    norms, 'mean' 1/in-degree, 'sum' validity); pass a dynamic scale at
    call time to override (DropEdge)."""
    assert agg_type in ("sum", "mean", "sym", "max")
    assert graph.n_pad % n_shards == 0
    n_local = graph.n_pad // n_shards
    S = n_shards
    from ..graph import host_array

    src = np.asarray(host_array(graph, "src"), np.int64)
    dst = np.asarray(host_array(graph, "dst"), np.int64)
    valid = np.asarray(host_array(graph, "edge_mask"), bool)
    in_deg = host_array(graph, "in_deg")
    out_deg = host_array(graph, "out_deg")

    # Content memo (same rationale as ops.ell.build_fast_graph): the
    # full-graph harnesses rebuild the identical graph once per --nruns
    # run; the halo schedule depends on structure + DEGREES (the static
    # scales bake them in, and host_array supports sliced GraphBatches
    # whose degrees need not derive from src/dst) + build options.
    import hashlib

    from ..ops.ell import reset_plan_timings

    reset_plan_timings()
    h = hashlib.blake2b(digest_size=16)
    h.update(np.ascontiguousarray(src).tobytes())
    h.update(np.ascontiguousarray(dst).tobytes())
    h.update(np.ascontiguousarray(valid).tobytes())
    h.update(np.ascontiguousarray(in_deg).tobytes())
    h.update(np.ascontiguousarray(out_deg).tobytes())
    key = (h.hexdigest(), graph.n_pad, graph.e_pad, n_shards, agg_type,
           max_budget)
    hit = _HALO_MEMO.get(key)
    if hit is not None:
        import sir_gcn_tpu.ops.ell as _ell

        _ell._LAST_MEMO_HIT = True
        return hit

    from ..ops.ell import static_edge_scale

    # max has no degree scale — its static per-slot array is validity
    escale = static_edge_scale(
        agg_type if agg_type != "max" else "sum", src, dst, valid,
        in_deg, out_deg).astype(np.float32)

    bounds = np.searchsorted(dst, np.arange(S + 1) * n_local)
    e_max = _pad8(int((bounds[1:] - bounds[:-1]).max(initial=1)))

    # ---- pass 1: per-pair unique remote src rows -> h_max ----------------
    uniq = {}   # (receiver, sender) -> unique global src ids
    per_shard = []
    for r in range(S):
        lo, hi = int(bounds[r]), int(bounds[r + 1])
        src_g = src[lo:hi]
        dst_l = dst[lo:hi] - r * n_local
        v_l = valid[lo:hi]
        owner = src_g // n_local
        interior = v_l & (owner == r)
        boundary = v_l & (owner != r)
        for s in range(S):
            if s == r:
                continue
            u = np.unique(src_g[boundary & (owner == s)])
            if u.size:
                uniq[(r, s)] = u
        per_shard.append((lo, hi, src_g, dst_l, v_l, interior, boundary,
                          owner))
    h_max = _pad8(max((u.size for u in uniq.values()), default=1))

    # ---- pass 2: per-shard plans + slot arrays ---------------------------
    from ..ops.ell import uniform_stage2

    dplans_i, dplans_b, splans_i, hplans, rplans = [], [], [], [], []
    args_i, args_b, args_s, args_h, args_r = [], [], [], [], []
    ssl, ssh, sc_i, sc_b, send_all = [], [], [], [], []
    halo_keys = []
    for r in range(S):
        lo, hi, src_g, dst_l, v_l, interior, boundary, owner = per_shard[r]
        n_e = hi - lo

        # halo key per boundary edge: sender block * h_max + position
        halo_key = np.zeros(max(n_e, 1), np.int64)
        for s in range(S):
            if (r, s) not in uniq:
                continue
            sel = boundary & (owner == s)
            pos = np.searchsorted(uniq[(r, s)], src_g[sel])
            halo_key[np.nonzero(sel)[0]] = s * h_max + pos
        halo_keys.append(halo_key)

        def plan(lst, alst, keys, valid_, nk):
            lst.append(build_reduce_plan(keys, valid_, nk, max_budget))
            alst.append((keys, valid_, nk, max_budget))

        plan(dplans_i, args_i, dst_l, interior, n_local)
        plan(dplans_b, args_b, dst_l, boundary, n_local)
        plan(splans_i, args_s, src_g - r * n_local, interior, n_local)
        plan(hplans, args_h, halo_key, boundary, S * h_max)

        # send schedule: block d = rows this shard sends to receiver d
        sidx = np.zeros(S * h_max, np.int64)
        skey = np.full(S * h_max, -1, np.int64)
        for d in range(S):
            if (d, r) not in uniq:
                continue
            u = uniq[(d, r)]
            sidx[d * h_max: d * h_max + u.size] = u - r * n_local
            skey[d * h_max: d * h_max + u.size] = u - r * n_local
        send_all.append(sidx)
        plan(rplans, args_r, np.maximum(skey, 0), skey >= 0, n_local)

    dplans_i = harmonize_reduce_plans(uniform_stage2(dplans_i, args_i))
    dplans_b = harmonize_reduce_plans(uniform_stage2(dplans_b, args_b))
    splans_i = harmonize_reduce_plans(uniform_stage2(splans_i, args_s))
    hplans = harmonize_reduce_plans(uniform_stage2(hplans, args_h))
    rplans = harmonize_reduce_plans(uniform_stage2(rplans, args_r))

    sfd_i, sfd_b = [], []
    sdn_i, ssc_i, hdn, hsc = [], [], [], []
    eidx, evalid = [], []
    e2d_i_all, e2d_b_all, eint_all, evld_all = [], [], [], []
    for r in range(S):
        lo, hi, src_g, dst_l, v_l, interior, boundary, owner = per_shard[r]
        n_e = hi - lo
        esc_l = escale[lo:hi]
        dpi, dpb = dplans_i[r], dplans_b[r]
        spi, hp = splans_i[r], hplans[r]

        ssl.append(_slot_values(dpi, src_g - r * n_local))
        sc_i.append(_slot_values(dpi, esc_l))
        sc_b.append(_slot_values(dpb, esc_l))
        ssh.append(_slot_values(dpb, halo_keys[r]))

        e2d_i = _dst_slot_of_edge(dpi, n_e)
        e2d_b = _dst_slot_of_edge(dpb, n_e)
        sfd_i.append(_slot_values(spi, e2d_i))
        sfd_b.append(_slot_values(hp, e2d_b))
        sdn_i.append(_slot_values(spi, dst_l))
        ssc_i.append(_slot_values(spi, esc_l))
        hdn.append(_slot_values(hp, dst_l))
        hsc.append(_slot_values(hp, esc_l))

        idx = np.minimum(lo + np.arange(e_max), graph.e_pad - 1)
        eidx.append(idx)
        evalid.append((np.arange(e_max) < n_e).astype(np.float32))

        pad = lambda a, fill=0: np.concatenate(
            [a[:n_e], np.full(e_max - min(n_e, e_max), fill, a.dtype)])
        e2d_i_all.append(pad(e2d_i))
        e2d_b_all.append(pad(e2d_b))
        eint_all.append(pad(interior.astype(np.float32)))
        evld_all.append(pad(v_l.astype(np.float32)))

    # inverse of the edge slicing: global edge -> r * e_max + local pos
    owner_e = np.clip(
        np.searchsorted(bounds, np.arange(graph.e_pad), side="right") - 1,
        0, S - 1)
    unslice = owner_e * e_max + np.minimum(
        np.arange(graph.e_pad) - bounds[owner_e], e_max - 1)

    hfg_out = HaloFastGraph(
        dst_plan_i=_stack_plans(dplans_i),
        dst_plan_b=_stack_plans(dplans_b),
        src_plan_i=_stack_plans(splans_i),
        halo_plan=_stack_plans(hplans),
        ret_plan=_stack_plans(rplans),
        slot_src_local=jnp.asarray(np.stack(ssl), jnp.int32),
        slot_src_halo=jnp.asarray(np.stack(ssh), jnp.int32),
        scale_i=jnp.asarray(np.stack(sc_i)),
        scale_b=jnp.asarray(np.stack(sc_b)),
        src_from_dst_i=jnp.asarray(np.stack(sfd_i), jnp.int32),
        src_from_dst_b=jnp.asarray(np.stack(sfd_b), jnp.int32),
        src_dstnode_i=jnp.asarray(np.stack(sdn_i), jnp.int32),
        src_scale_i=jnp.asarray(np.stack(ssc_i)),
        halo_dstnode=jnp.asarray(np.stack(hdn), jnp.int32),
        halo_scale=jnp.asarray(np.stack(hsc)),
        send_idx=jnp.asarray(np.stack(send_all), jnp.int32),
        edge_slice_idx=jnp.asarray(np.stack(eidx), jnp.int32),
        edge_slice_valid=jnp.asarray(np.stack(evalid)),
        edge2dst_i=jnp.asarray(np.stack(e2d_i_all), jnp.int32),
        edge2dst_b=jnp.asarray(np.stack(e2d_b_all), jnp.int32),
        edge_interior=jnp.asarray(np.stack(eint_all)),
        edge_valid=jnp.asarray(np.stack(evld_all)),
        edge_unslice=jnp.asarray(unslice, jnp.int32),
        e_pad=graph.e_pad,
        n_shards=S,
        n_local=n_local,
        h_max=h_max,
        e_max=e_max,
        agg_type=agg_type,
    )
    while len(_HALO_MEMO) >= _HALO_MEMO_MAX:
        _HALO_MEMO.pop(next(iter(_HALO_MEMO)))
    _HALO_MEMO[key] = hfg_out
    return hfg_out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloGraph:
    """A model-layer-consumable handle for halo-distributed full-graph
    training: the global :class:`GraphBatch` (masks/degrees for norms and
    encoders) plus the halo plans and the mesh. ``sir_aggregate``
    dispatches on this type, so ``SIRConv``-based models run unchanged
    with node-sharded features — the TPU-native analog of swapping the
    graph object, the way the reference swaps DGLGraphs. Edge features
    (SIREConv, ``models/conv.py:111``) and max aggregation
    (``models/conv.py:47``) run the XLA halo variants."""

    graph: object                 # GraphBatch (global)
    hfg: HaloFastGraph
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    # GraphBatch conveniences (same surface as ops.ell.FastGraph)
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


def build_halo_graph(graph, n_shards: int, mesh: Mesh,
                     agg_type: str = "sym", axis: str = "graph",
                     max_budget: int = 256) -> HaloGraph:
    """Host-side: wrap a GraphBatch for halo-distributed training."""
    return HaloGraph(graph=graph,
                     hfg=build_halo_fast_graph(graph, n_shards,
                                               agg_type=agg_type,
                                               max_budget=max_budget),
                     mesh=mesh, axis=axis)


def _plan_spec(hfg: HaloFastGraph, axis: str):
    """shard_map spec for the stacked plan pytree: every leaf is sharded
    over its leading shard axis except ``edge_unslice``, which is a global
    [E_pad] map consumed only outside shard_map (replicated)."""
    spec = jax.tree_util.tree_map(lambda _: P(axis), hfg)
    return dataclasses.replace(spec, edge_unslice=P())


def _sm_view(hfg: HaloFastGraph):
    """The hfg operand actually passed INTO shard_map programs:
    ``edge_unslice`` ([E_pad] int32) is consumed only OUTSIDE shard_map
    (``_unshard_edge_grad``), but as an operand it would be replicated
    into every per-device program (ADVICE r2); swap in an 8-element
    placeholder (the replicated spec accepts any shape)."""
    return dataclasses.replace(hfg,
                               edge_unslice=jnp.zeros((8,), jnp.int32))


_HALO_MEMO: dict = {}
_HALO_MEMO_MAX = 2

_BUILDER_CACHE: dict = {}


def _cached(kind, build, hfg, activation, extra=()):
    """Builder cache: halo_sir_aggregate runs once per conv layer per
    trace, and each make_* call constructs fresh shard_map programs —
    identical for the same (plans, activation). Keyed on object ids,
    revalidated by identity (same pattern as ops.ell's probe cache)."""
    key = (kind, id(hfg), id(activation)) + tuple(extra)
    hit = _BUILDER_CACHE.get(key)
    if hit is not None and hit[0] is hfg and hit[1] is activation:
        return hit[2]
    f = build()
    if len(_BUILDER_CACHE) > 64:
        _BUILDER_CACHE.clear()
    _BUILDER_CACHE[key] = (hfg, activation, f)
    return f


def halo_sir_aggregate(hg: HaloGraph, eq, ek, activation, agg_type,
                       e=None, w_relation=None, b_relation=None,
                       edge_mask=None):
    """The ``sir_aggregate`` implementation for :class:`HaloGraph`.

    Linear aggregators with no dynamic mask consume the host-precomputed
    per-slot scales (mean's division folded in); a DropEdge mask engages
    the dynamic-scale variant (mean then divides by dynamic counts —
    single-device semantics, distributed). ``e`` (SIREConv edge features,
    reference ``models/conv.py:111``) and ``agg_type='max'`` (per-edge
    W_R before the reduce, ``models/conv.py:47``) are supported via the
    XLA halo variants."""
    from ..ops.message_passing import get_edge_dtype

    assert agg_type in ("sum", "mean", "sym", "max"), agg_type
    assert agg_type == hg.hfg.agg_type, (
        f"HaloGraph was built for agg_type={hg.hfg.agg_type!r}, "
        f"conv uses {agg_type!r}")
    g = hg.graph
    h = eq.shape[-1]
    we = e is not None
    extra = (hg.axis, we, h, get_edge_dtype())
    if agg_type == "max":
        f = _cached("max", lambda: make_halo_sir_aggregate_max(
            hg.hfg, activation, hg.mesh, hg.axis, with_edge=we),
            hg.hfg, activation, extra)
        valid = g.edge_mask if edge_mask is None else jnp.logical_and(
            g.edge_mask, edge_mask)
        b = (b_relation if b_relation is not None
             else jnp.zeros((w_relation.shape[1],), eq.dtype))
        e_in = e if we else jnp.zeros((1, 1), eq.dtype)
        return f(eq, ek, e_in, valid.astype(jnp.float32), w_relation, b)
    if edge_mask is None:
        f = _cached("static", lambda: make_halo_sir_aggregate(
            hg.hfg, activation, hg.mesh, hg.axis, with_edge=we,
            feat_width=h), hg.hfg, activation, extra)
        return f(eq, ek, e) if we else f(eq, ek)
    valid = jnp.logical_and(g.edge_mask, edge_mask)
    scale = valid.astype(jnp.float32)
    if agg_type == "sym":
        in_norm = jnp.power(jnp.maximum(g.in_deg, 1.0), -0.5)
        out_norm = jnp.power(jnp.maximum(g.out_deg, 1.0), -0.5)
        scale = scale * (jnp.take(out_norm, g.src)
                         * jnp.take(in_norm, g.dst))
    f = _cached("dynamic", lambda: make_halo_sir_aggregate(
        hg.hfg, activation, hg.mesh, hg.axis, dynamic_scale=True,
        with_edge=we, feat_width=h), hg.hfg, activation, extra)
    out = f(eq, ek, e, scale) if we else f(eq, ek, scale)
    if agg_type == "mean":
        counts_fn = _cached("counts", lambda: make_halo_counts(
            hg.hfg, hg.mesh, hg.axis), hg.hfg, activation, (hg.axis,))
        out = out / jnp.maximum(counts_fn(scale), 1.0)[:, None]
    return out


def _to_shard_scale(hfg: HaloFastGraph, edge_scale):
    """[E_pad] global per-edge scale -> [S*Emax] shard-sliced rows (the
    single slicing used by forward, backward AND the mean counts — keep
    one copy so they can never disagree)."""
    s = (jnp.take(edge_scale, hfg.edge_slice_idx.reshape(-1))
         .reshape(hfg.n_shards, hfg.e_max) * hfg.edge_slice_valid)
    return s.reshape(hfg.n_shards * hfg.e_max)


def _exchange(ek_l, hfg_l, axis: str, dtype=None, unit: bool = False):
    """Boundary-row all_to_all: [S*Hm, H], block d = rows for receiver d;
    tiled all_to_all swaps blocks so block j on the receiver = rows sent
    by shard j. ``dtype`` (the edge dtype on the Pallas path) carries the
    exchange in half precision — the halo table only feeds bf16 slot
    gathers and f32-accumulating kernels. ``unit=True`` (1-shard mesh
    axis) elides the provably-identity collective."""
    if dtype is not None:
        ek_l = ek_l.astype(dtype)
    send = jnp.take(ek_l, hfg_l.send_idx[0], axis=0)
    if unit:
        return send
    return jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=True)


def _return_exchange(g_halo, axis: str, unit: bool = False):
    """The transposed cotangent all_to_all (f32 — it accumulates)."""
    if unit:
        return g_halo
    return jax.lax.all_to_all(g_halo, axis, split_axis=0, concat_axis=0,
                              tiled=True)


def _to_shard_edges(hfg: HaloFastGraph, e):
    """[E_pad, H] global sorted-order edge features -> [S*Emax, H] shard
    slices (the edge analog of :func:`_to_shard_scale`)."""
    return (jnp.take(e, hfg.edge_slice_idx.reshape(-1), axis=0)
            * hfg.edge_slice_valid.reshape(-1)[:, None])


def _unshard_edge_grad(hfg: HaloFastGraph, g_e_sh):
    """[S*Emax, H] per-shard edge cotangents -> [E_pad, H] global sorted
    order via the host-precomputed inverse map (scatter-free). Chunked
    above 1M padded edges like the single-device edge cotangent
    (ops/ell.py `_edge_cotangent`): bounds the per-op size so XLA's
    compile time stays linear at full-graph scale (ROADMAP round 4)."""
    from ..ops.ell import _EDGE_COT_CHUNKS, _auto_chunks

    idx = hfg.edge_unslice
    e_pad = idx.shape[0]
    chunks = _EDGE_COT_CHUNKS or _auto_chunks(e_pad)
    if chunks <= 1 or e_pad % chunks != 0:
        return jnp.take(g_e_sh, idx, axis=0)
    rows = jax.lax.map(lambda i: jnp.take(g_e_sh, i, axis=0),
                       idx.reshape(chunks, e_pad // chunks))
    return rows.reshape(e_pad, -1)


def make_halo_sir_aggregate(
    hfg: HaloFastGraph,
    activation: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    axis: str = "graph",
    dynamic_scale: bool = False,
    use_pallas: bool = None,
    with_edge: bool = False,
    feat_width: int = 16,
    elide_unit_collectives: bool = True,
):
    """Build ``f(eq, ek, e[, edge_scale]) -> out`` over the halo fast path.

    ``use_pallas=None`` auto-selects the fused-kernel variant
    (:func:`make_halo_sir_aggregate_pallas`) on TPU for elementwise,
    closure-free activations (probed at ``feat_width``); edge-feature
    aggregation (``with_edge=True``, the SIREConv contract — reference
    ``models/conv.py:111,113``) runs the XLA variant.

    eq/ek/out are [N_pad, H] row-sharded over ``axis``; ``e`` is the
    [E_pad, H] edge projection in global sorted edge order (or a dummy
    when ``with_edge=False``). With ``dynamic_scale=True`` the last
    argument is the same [E_pad] per-edge scale the single-device fast
    path takes (sym norms x DropEdge mask ...); it REPLACES the static
    folded scale, and for ``agg_type='mean'`` the caller divides by
    dynamic counts (see :func:`make_halo_counts`). Differentiable wrt
    eq/ek/e; scale is non-differentiable (degree/mask-derived in every
    caller).
    """
    if use_pallas is None:
        from ..ops.ell import _activation_info
        from ..ops.pallas import pallas_available

        elem, ok = _activation_info(activation, feat_width)
        use_pallas = (pallas_available() and elem and ok
                      and not with_edge)
    if use_pallas:
        return make_halo_sir_aggregate_pallas(
            hfg, activation, mesh, axis, dynamic_scale=dynamic_scale,
            elide_unit_collectives=elide_unit_collectives)
    S, Hm = hfg.n_shards, hfg.h_max
    node_spec = P(axis)
    plan_spec = _plan_spec(hfg, axis)
    hfg_sm = _sm_view(hfg)
    unit = elide_unit_collectives and mesh.shape[axis] == 1

    def slot_scales(scale_l, hfg_l, dpi, dpb):
        if dynamic_scale:
            s_i = dpi.gather_edges(scale_l) * dpi.slot_valid
            s_b = dpb.gather_edges(scale_l) * dpb.slot_valid
        else:
            s_i, s_b = hfg_l.scale_i[0], hfg_l.scale_b[0]
        return s_i, s_b

    def slot_zs(eq_l, ek_l, e_l, halo, hfg_l, dpi, dpb):
        z_i = dpi.spread(eq_l) + jnp.take(ek_l, hfg_l.slot_src_local[0],
                                          axis=0)
        z_b = dpb.spread(eq_l) + jnp.take(halo, hfg_l.slot_src_halo[0],
                                          axis=0)
        if with_edge:
            z_i = z_i + dpi.gather_edges(e_l)
            z_b = z_b + dpb.gather_edges(e_l)
        return z_i, z_b

    def local_fwd(eq_l, ek_l, e_l, scale_l, hfg_l):
        dpi = _unstack_plan(hfg_l.dst_plan_i)
        dpb = _unstack_plan(hfg_l.dst_plan_b)
        s_i, s_b = slot_scales(scale_l, hfg_l, dpi, dpb)
        halo = _exchange(ek_l, hfg_l, axis, unit=unit)
        # interior term has no dependency on the collective -> overlaps
        z_i, z_b = slot_zs(eq_l, ek_l, e_l, halo, hfg_l, dpi, dpb)
        return (dpi.reduce_slots_sum(activation(z_i) * s_i[:, None])
                + dpb.reduce_slots_sum(activation(z_b) * s_b[:, None]))

    def local_bwd(g_l, eq_l, ek_l, e_l, scale_l, hfg_l):
        dpi = _unstack_plan(hfg_l.dst_plan_i)
        dpb = _unstack_plan(hfg_l.dst_plan_b)
        spi = _unstack_plan(hfg_l.src_plan_i)
        hp = _unstack_plan(hfg_l.halo_plan)
        rp = _unstack_plan(hfg_l.ret_plan)
        s_i, s_b = slot_scales(scale_l, hfg_l, dpi, dpb)
        halo = _exchange(ek_l, hfg_l, axis, unit=unit)

        z_i, z_b = slot_zs(eq_l, ek_l, e_l, halo, hfg_l, dpi, dpb)
        _, vjp_i = jax.vjp(activation, z_i)
        _, vjp_b = jax.vjp(activation, z_b)
        (g_z_i,) = vjp_i(dpi.spread(g_l) * s_i[:, None])
        (g_z_b,) = vjp_b(dpb.spread(g_l) * s_b[:, None])
        g_z_i = g_z_i * dpi.slot_valid[:, None]
        g_z_b = g_z_b * dpb.slot_valid[:, None]

        g_eq = dpi.reduce_slots_sum(g_z_i) + dpb.reduce_slots_sum(g_z_b)

        g_ek = spi.reduce_slots_sum(
            jnp.take(g_z_i, hfg_l.src_from_dst_i[0], axis=0)
            * spi.slot_valid[:, None])
        # boundary cotangents: reduce into the halo table, send blocks
        # back to their senders, reduce by sent row
        g_halo = hp.reduce_slots_sum(
            jnp.take(g_z_b, hfg_l.src_from_dst_b[0], axis=0)
            * hp.slot_valid[:, None])
        ret = _return_exchange(g_halo, axis, unit)
        g_ek = g_ek + rp.reduce_slots_sum(
            rp.gather_edges(ret) * rp.slot_valid[:, None])
        if with_edge:
            g_e_l = (jnp.take(g_z_i, hfg_l.edge2dst_i[0], axis=0)
                     * hfg_l.edge_interior[0][:, None]
                     + jnp.take(g_z_b, hfg_l.edge2dst_b[0], axis=0)
                     * (1.0 - hfg_l.edge_interior[0])[:, None]
                     ) * hfg_l.edge_valid[0][:, None]
        else:
            g_e_l = jnp.zeros((hfg_l.edge_valid.shape[1], 1),
                              jnp.float32)
        return g_eq, g_ek, g_e_l

    fwd_sm = jax.jit(shard_map(
        local_fwd, mesh=mesh,
        in_specs=(node_spec, node_spec, node_spec, node_spec, plan_spec),
        out_specs=node_spec, check_vma=False))
    bwd_sm = jax.jit(shard_map(
        local_bwd, mesh=mesh,
        in_specs=(node_spec, node_spec, node_spec, node_spec, node_spec,
                  plan_spec),
        out_specs=(node_spec, node_spec, node_spec), check_vma=False))

    dummy_e = jnp.zeros((S * hfg.e_max, 1), jnp.float32)
    dummy_s = jnp.zeros((S * hfg.e_max,), jnp.float32)

    # arity matches the call contract: e appears only when with_edge,
    # edge_scale only when dynamic_scale (old callers stay valid)
    if dynamic_scale and with_edge:
        @jax.custom_vjp
        def f(eq, ek, e, edge_scale):
            return fwd_sm(eq, ek, _to_shard_edges(hfg, e),
                          _to_shard_scale(hfg, edge_scale), hfg_sm)

        def f_fwd(eq, ek, e, edge_scale):
            s = _to_shard_scale(hfg, edge_scale)
            e_sh = _to_shard_edges(hfg, e)
            return fwd_sm(eq, ek, e_sh, s, hfg_sm), (eq, ek, e_sh, s)

        def f_bwd(res, g):
            eq, ek, e_sh, s = res
            g_eq, g_ek, g_e_sh = bwd_sm(g, eq, ek, e_sh, s, hfg_sm)
            return (g_eq, g_ek, _unshard_edge_grad(hfg, g_e_sh),
                    jnp.zeros((hfg.e_pad,), s.dtype))
    elif with_edge:
        @jax.custom_vjp
        def f(eq, ek, e):
            return fwd_sm(eq, ek, _to_shard_edges(hfg, e), dummy_s, hfg_sm)

        def f_fwd(eq, ek, e):
            e_sh = _to_shard_edges(hfg, e)
            return fwd_sm(eq, ek, e_sh, dummy_s, hfg_sm), (eq, ek, e_sh)

        def f_bwd(res, g):
            eq, ek, e_sh = res
            g_eq, g_ek, g_e_sh = bwd_sm(g, eq, ek, e_sh, dummy_s, hfg_sm)
            return g_eq, g_ek, _unshard_edge_grad(hfg, g_e_sh)
    elif dynamic_scale:
        @jax.custom_vjp
        def f(eq, ek, edge_scale):
            return fwd_sm(eq, ek, dummy_e,
                          _to_shard_scale(hfg, edge_scale), hfg_sm)

        def f_fwd(eq, ek, edge_scale):
            s = _to_shard_scale(hfg, edge_scale)
            return fwd_sm(eq, ek, dummy_e, s, hfg_sm), (eq, ek, s)

        def f_bwd(res, g):
            eq, ek, s = res
            g_eq, g_ek, _ = bwd_sm(g, eq, ek, dummy_e, s, hfg_sm)
            return g_eq, g_ek, jnp.zeros((hfg.e_pad,), s.dtype)
    else:
        @jax.custom_vjp
        def f(eq, ek):
            return fwd_sm(eq, ek, dummy_e, dummy_s, hfg_sm)

        def f_fwd(eq, ek):
            return fwd_sm(eq, ek, dummy_e, dummy_s, hfg_sm), (eq, ek)

        def f_bwd(res, g):
            eq, ek = res
            g_eq, g_ek, _ = bwd_sm(g, eq, ek, dummy_e, dummy_s, hfg_sm)
            return g_eq, g_ek

    f.defvjp(f_fwd, f_bwd)
    return f


def make_halo_sir_aggregate_pallas(
    hfg: HaloFastGraph,
    activation: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    axis: str = "graph",
    dynamic_scale: bool = False,
    edge_dtype=None,
    interpret: bool = False,
    elide_unit_collectives: bool = True,
    per_bucket_takes: bool = False,
):
    """Fused-kernel variant of :func:`make_halo_sir_aggregate` for
    ELEMENTWISE activations: interior and boundary stages run the same
    Pallas bucket kernels as the single-device fast path (dual-output
    forward emitting the derivative-mass sbar -> g_eq is a node-sized
    multiply; node-table-major src-major backward reducing straight into
    the src plan / halo table). Comms shapes stay exactly as the XLA
    variant — one all_to_all of boundary rows forward, one cotangent
    all_to_all back — but the halo exchange itself is carried in the
    EDGE dtype (it only feeds bf16 slot gathers and f32-accumulating
    kernels: half the boundary bytes, numerics identical to the
    single-device bf16 pipeline); the cotangent return stays f32. On a
    1-device mesh axis the provably-identity collectives are elided
    (``elide_unit_collectives=False`` restores them for A/B
    measurement). ``edge_dtype=None`` follows the global
    ``set_edge_dtype``.

    ``per_bucket_takes`` slices the int32 index vectors per budget
    bucket and issues one take per bucket instead of slicing one big
    gathered [S, H] table. On the SHARDED path this closed the
    program-shape residual (86.0% -> 97.7% @1 — ell_distributed);
    measured HERE it is NEGATIVE (tools/r5sched.py --halo, same
    session: halo@1 15.65 ms / 88.1% big-table vs 16.54 ms / 83.4%
    per-bucket — the halo path's four smaller plan families fragment
    into takes XLA schedules worse than its slices), so the default
    stays OFF for halo."""
    from ..ops.ell import _bucket_offsets
    from ..ops.message_passing import get_edge_dtype
    from ..ops.pallas import bucket_bcast_act_reduce2, bucket_src_bwd

    if edge_dtype is None:
        edge_dtype = get_edge_dtype()
    S, Hm = hfg.n_shards, hfg.h_max
    node_spec = P(axis)
    plan_spec = _plan_spec(hfg, axis)
    hfg_sm = _sm_view(hfg)
    unit = elide_unit_collectives and mesh.shape[axis] == 1
    offs_di = _bucket_offsets(hfg.dst_plan_i.buckets1)
    offs_db = _bucket_offsets(hfg.dst_plan_b.buckets1)
    offs_si = _bucket_offsets(hfg.src_plan_i.buckets1)
    offs_hp = _bucket_offsets(hfg.halo_plan.buckets1)

    def cast(x):
        return x.astype(edge_dtype) if edge_dtype is not None else x

    def cat(xs):
        return jnp.concatenate(xs) if len(xs) > 1 else xs[0]

    def fwd_scales(scale_l, hfg_l, dpi, dpb):
        if dynamic_scale:
            return (dpi.gather_edges(scale_l) * dpi.slot_valid,
                    dpb.gather_edges(scale_l) * dpb.slot_valid)
        return (hfg_l.scale_i[0].astype(jnp.float32),
                hfg_l.scale_b[0].astype(jnp.float32))

    def gathered(table, idx, offs):
        """Per-bucket gathered blocks (see ``per_bucket_takes``)."""
        if per_bucket_takes:
            return [jnp.take(table, idx[so:so + b * nr], axis=0)
                    for b, nr, so, ro in offs]
        full = jnp.take(table, idx, axis=0)
        return [full[so:so + b * nr] for b, nr, so, ro in offs]

    def stage2(ekgs, eq_rows, s, offs, plan):
        rows, srows = [], []
        for (b, nr, so, ro), ekg_b in zip(offs, ekgs):
            r, sr = bucket_bcast_act_reduce2(
                ekg_b, eq_rows[ro:ro + nr],
                s[so:so + b * nr].reshape(nr, b), b, activation,
                interpret=interpret)
            rows.append(r)
            srows.append(sr)
        return plan.finalize_rows_sum(cat(rows)), \
            plan.finalize_rows_sum(cat(srows))

    def lane_pad(x):
        """Pad the feature dim to 128 INSIDE the region — exact for
        elementwise sigma; placed next to the gathers it feeds so XLA's
        pad-sink/fusion rewrites apply (tools/hlo_diff.py). The
        exchange itself stays at the caller's width: only the (small)
        halo table is padded after the collective."""
        from ..ops.ell import _round_up

        h = x.shape[-1]
        hp = _round_up(h, 128)
        if hp == h:
            return x
        return jnp.pad(x, ((0, 0), (0, hp - h)))

    def local_fwd2(eq_l, ek_l, scale_l, hfg_l):
        h = eq_l.shape[-1]
        dpi = _unstack_plan(hfg_l.dst_plan_i)
        dpb = _unstack_plan(hfg_l.dst_plan_b)
        s_i, s_b = fwd_scales(scale_l, hfg_l, dpi, dpb)
        halo = lane_pad(_exchange(ek_l, hfg_l, axis, dtype=edge_dtype,
                                  unit=unit))
        eq_l, ek_l = lane_pad(eq_l), lane_pad(ek_l)
        # interior stage has no dependency on the collective -> overlaps
        ekg_i = gathered(cast(ek_l), hfg_l.slot_src_local[0], offs_di)
        out_i, sb_i = stage2(ekg_i, jnp.take(eq_l, dpi.row_key, axis=0),
                             s_i, offs_di, dpi)
        ekg_b = gathered(halo, hfg_l.slot_src_halo[0], offs_db)
        out_b, sb_b = stage2(ekg_b, jnp.take(eq_l, dpb.row_key, axis=0),
                             s_b, offs_db, dpb)
        return (out_i + out_b)[:, :h], (sb_i + sb_b)[:, :h]

    def src_stage(eqgs, rows_tbl, s, ggs, offs, plan):
        rows = []
        for (b, nr, so, ro), eqg_b, gg_b in zip(offs, eqgs, ggs):
            r, _ = bucket_src_bwd(
                eqg_b, rows_tbl[ro:ro + nr],
                s[so:so + b * nr].reshape(nr, b),
                gg_b, b, activation, interpret=interpret)
            rows.append(r)
        return plan.finalize_rows_sum(cat(rows))

    def local_bwd(g_l, eq_l, ek_l, scale_l, hfg_l):
        h = eq_l.shape[-1]
        spi = _unstack_plan(hfg_l.src_plan_i)
        hp = _unstack_plan(hfg_l.halo_plan)
        rp = _unstack_plan(hfg_l.ret_plan)
        if dynamic_scale:
            s_si = spi.gather_edges(scale_l) * spi.slot_valid
            s_hp = hp.gather_edges(scale_l) * hp.slot_valid
        else:
            s_si = hfg_l.src_scale_i[0].astype(jnp.float32)
            s_hp = hfg_l.halo_scale[0].astype(jnp.float32)
        halo = lane_pad(_exchange(ek_l, hfg_l, axis, dtype=edge_dtype,
                                  unit=unit))
        g_l, eq_l, ek_l = lane_pad(g_l), lane_pad(eq_l), lane_pad(ek_l)

        # interior: z = eq[dst_e] + ek_l[src rows], reduce by local src
        eqg = gathered(cast(eq_l), hfg_l.src_dstnode_i[0], offs_si)
        gg = gathered(cast(g_l), hfg_l.src_dstnode_i[0], offs_si)
        g_ek = src_stage(eqg, jnp.take(ek_l, spi.row_key, axis=0),
                         s_si, gg, offs_si, spi)[:, :h]

        # boundary: z = eq[dst_e] + halo[key rows], reduce into the halo
        # table, return cotangent blocks to their senders (at the
        # caller's width — no padded columns over the wire)
        eqg_b = gathered(cast(eq_l), hfg_l.halo_dstnode[0], offs_hp)
        gg_b = gathered(cast(g_l), hfg_l.halo_dstnode[0], offs_hp)
        g_halo = src_stage(eqg_b, jnp.take(halo, hp.row_key, axis=0),
                           s_hp, gg_b, offs_hp, hp)[:, :h]
        ret = _return_exchange(g_halo, axis, unit)
        return g_ek + rp.reduce_slots_sum(
            rp.gather_edges(ret) * rp.slot_valid[:, None])

    # No jax.jit wrapper (a nested pjit is an optimization boundary —
    # tools/hlo_diff.py); call sites trace these under the caller's jit.
    if unit:
        # 1-device mesh axis: no manual-sharding region needed (see
        # ell_distributed.make_sharded_sir_aggregate_pallas)
        fwd2_sm, bwd_sm = local_fwd2, local_bwd
    else:
        fwd2_sm = shard_map(
            local_fwd2, mesh=mesh,
            in_specs=(node_spec, node_spec, node_spec, plan_spec),
            out_specs=(node_spec, node_spec), check_vma=False)
        bwd_sm = shard_map(
            local_bwd, mesh=mesh,
            in_specs=(node_spec, node_spec, node_spec, node_spec,
                      plan_spec),
            out_specs=node_spec, check_vma=False)

    if dynamic_scale:
        @jax.custom_vjp
        def f(eq, ek, edge_scale):
            return fwd2_sm(eq, ek, _to_shard_scale(hfg, edge_scale), hfg_sm)[0]

        def f_fwd(eq, ek, edge_scale):
            s = _to_shard_scale(hfg, edge_scale)
            out, sbar = fwd2_sm(eq, ek, s, hfg_sm)
            return out, (eq, ek, s, sbar)

        def f_bwd(res, g):
            eq, ek, s, sbar = res
            g_eq = g * sbar
            g_ek = bwd_sm(g, eq, ek, s, hfg_sm)
            return g_eq, g_ek, jnp.zeros((hfg.e_pad,), s.dtype)
    else:
        dummy = jnp.zeros((S * hfg.e_max,), jnp.float32)

        @jax.custom_vjp
        def f(eq, ek):
            return fwd2_sm(eq, ek, dummy, hfg_sm)[0]

        def f_fwd(eq, ek):
            out, sbar = fwd2_sm(eq, ek, dummy, hfg_sm)
            return out, (eq, ek, sbar)

        def f_bwd(res, g):
            eq, ek, sbar = res
            return g * sbar, bwd_sm(g, eq, ek, dummy, hfg_sm)

    f.defvjp(f_fwd, f_bwd)
    return f


def make_halo_sir_aggregate_max(
    hfg: HaloFastGraph,
    activation: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    axis: str = "graph",
    with_edge: bool = False,
):
    """Max-aggregation halo path (reference ``models/conv.py:47``: W_R per
    edge *before* the reduce):

        out[u] = max_e act(eq[u] + ek[src_e] [+ e_e]) @ W_R + b

    ``f(eq, ek, e, edge_scale, w, b) -> [N_pad, O]``; ``edge_scale`` is
    the [E_pad] validity (DropEdge folds in), slots with scale <= 0 are
    excluded, empty nodes zero-fill (DGL semantics). Backward routes
    cotangents through the argmax slots (ties split equally, across the
    interior/boundary stages and shards alike); W_R/b grads ``psum`` over
    the mesh axis. XLA variant only — max is never the perf-critical
    aggregation (ROADMAP), so no fused-kernel twin."""
    S = hfg.n_shards
    node_spec = P(axis)
    plan_spec = _plan_spec(hfg, axis)
    hfg_sm = _sm_view(hfg)
    unit = mesh.shape[axis] == 1

    def stage_inputs(eq_l, ek_l, e_l, scale_l, hfg_l, dpi, dpb):
        halo = _exchange(ek_l, hfg_l, axis, unit=unit)
        z_i = dpi.spread(eq_l) + jnp.take(ek_l, hfg_l.slot_src_local[0],
                                          axis=0)
        z_b = dpb.spread(eq_l) + jnp.take(halo, hfg_l.slot_src_halo[0],
                                          axis=0)
        if with_edge:
            z_i = z_i + dpi.gather_edges(e_l)
            z_b = z_b + dpb.gather_edges(e_l)
        v_i = (dpi.gather_edges(scale_l) * dpi.slot_valid) > 0
        v_b = (dpb.gather_edges(scale_l) * dpb.slot_valid) > 0
        return z_i, z_b, v_i, v_b

    def local_fwd(eq_l, ek_l, e_l, scale_l, w, b, hfg_l):
        dpi = _unstack_plan(hfg_l.dst_plan_i)
        dpb = _unstack_plan(hfg_l.dst_plan_b)
        z_i, z_b, v_i, v_b = stage_inputs(eq_l, ek_l, e_l, scale_l,
                                          hfg_l, dpi, dpb)
        m_i = activation(z_i) @ w + b
        m_b = activation(z_b) @ w + b
        neg = jnp.finfo(m_i.dtype).min
        rows_i = dpi.reduce_slots_max(jnp.where(v_i[:, None], m_i, neg))
        rows_b = dpb.reduce_slots_max(jnp.where(v_b[:, None], m_b, neg))
        out = jnp.maximum(rows_i, rows_b)
        has = (dpi.reduce_slots_sum(v_i.astype(m_i.dtype)[:, None])
               + dpb.reduce_slots_sum(v_b.astype(m_b.dtype)[:, None])) > 0
        return jnp.where(has & (out > neg / 2), out, 0.0)

    def local_bwd(g_l, out_l, eq_l, ek_l, e_l, scale_l, w, b, hfg_l):
        dpi = _unstack_plan(hfg_l.dst_plan_i)
        dpb = _unstack_plan(hfg_l.dst_plan_b)
        spi = _unstack_plan(hfg_l.src_plan_i)
        hp = _unstack_plan(hfg_l.halo_plan)
        rp = _unstack_plan(hfg_l.ret_plan)
        z_i, z_b, v_i, v_b = stage_inputs(eq_l, ek_l, e_l, scale_l,
                                          hfg_l, dpi, dpb)
        a_i, vjp_i = jax.vjp(activation, z_i)
        a_b, vjp_b = jax.vjp(activation, z_b)
        m_i = a_i @ w + b
        m_b = a_b @ w + b
        # winners per (slot, o); ties split equally across both stages
        win_i = ((m_i == dpi.spread(out_l)) & v_i[:, None]).astype(
            m_i.dtype)
        win_b = ((m_b == dpb.spread(out_l)) & v_b[:, None]).astype(
            m_b.dtype)
        counts = (dpi.reduce_slots_sum(win_i)
                  + dpb.reduce_slots_sum(win_b))
        gsc = g_l / jnp.maximum(counts, 1.0)
        g_m_i = dpi.spread(gsc) * win_i
        g_m_b = dpb.spread(gsc) * win_b

        g_w = jax.lax.psum(a_i.T @ g_m_i + a_b.T @ g_m_b, axis)
        g_b = jax.lax.psum(g_m_i.sum(0) + g_m_b.sum(0), axis)
        (g_z_i,) = vjp_i(g_m_i @ w.T)
        (g_z_b,) = vjp_b(g_m_b @ w.T)
        g_z_i = g_z_i * dpi.slot_valid[:, None]
        g_z_b = g_z_b * dpb.slot_valid[:, None]

        g_eq = dpi.reduce_slots_sum(g_z_i) + dpb.reduce_slots_sum(g_z_b)
        g_ek = spi.reduce_slots_sum(
            jnp.take(g_z_i, hfg_l.src_from_dst_i[0], axis=0)
            * spi.slot_valid[:, None])
        g_halo = hp.reduce_slots_sum(
            jnp.take(g_z_b, hfg_l.src_from_dst_b[0], axis=0)
            * hp.slot_valid[:, None])
        ret = _return_exchange(g_halo, axis, unit)
        g_ek = g_ek + rp.reduce_slots_sum(
            rp.gather_edges(ret) * rp.slot_valid[:, None])
        if with_edge:
            g_e_l = (jnp.take(g_z_i, hfg_l.edge2dst_i[0], axis=0)
                     * hfg_l.edge_interior[0][:, None]
                     + jnp.take(g_z_b, hfg_l.edge2dst_b[0], axis=0)
                     * (1.0 - hfg_l.edge_interior[0])[:, None]
                     ) * hfg_l.edge_valid[0][:, None]
        else:
            g_e_l = jnp.zeros((hfg_l.edge_valid.shape[1], 1),
                              jnp.float32)
        return g_eq, g_ek, g_e_l, g_w, g_b

    fwd_sm = jax.jit(shard_map(
        local_fwd, mesh=mesh,
        in_specs=(node_spec, node_spec, node_spec, node_spec, P(), P(),
                  plan_spec),
        out_specs=node_spec, check_vma=False))
    bwd_sm = jax.jit(shard_map(
        local_bwd, mesh=mesh,
        in_specs=(node_spec, node_spec, node_spec, node_spec, node_spec,
                  node_spec, P(), P(), plan_spec),
        out_specs=(node_spec, node_spec, node_spec, P(), P()),
        check_vma=False))

    def shard_e(e):
        if with_edge:
            return _to_shard_edges(hfg, e)
        return jnp.zeros((S * hfg.e_max, 1), jnp.float32)

    @jax.custom_vjp
    def f(eq, ek, e, edge_scale, w, b):
        return fwd_sm(eq, ek, shard_e(e), _to_shard_scale(hfg, edge_scale),
                      w, b, hfg_sm)

    def f_fwd(eq, ek, e, edge_scale, w, b):
        s = _to_shard_scale(hfg, edge_scale)
        e_sh = shard_e(e)
        out = fwd_sm(eq, ek, e_sh, s, w, b, hfg_sm)
        return out, (eq, ek, e, e_sh, s, w, b, out)

    def f_bwd(res, g):
        eq, ek, e, e_sh, s, w, b, out = res
        g_eq, g_ek, g_e_sh, g_w, g_b = bwd_sm(g, out, eq, ek, e_sh, s,
                                              w, b, hfg_sm)
        g_e = (_unshard_edge_grad(hfg, g_e_sh) if with_edge
               else jnp.zeros_like(e))
        return (g_eq, g_ek, g_e, jnp.zeros((hfg.e_pad,), s.dtype),
                g_w, g_b)

    f.defvjp(f_fwd, f_bwd)
    return f


def make_halo_counts(hfg: HaloFastGraph, mesh: Mesh, axis: str = "graph"):
    """Per-dst dynamic edge counts for mean aggregation with a dynamic
    scale: ``counts(edge_scale)[u] = sum of scale over u's in-edges``
    (purely local — no communication)."""
    node_spec = P(axis)
    plan_spec = _plan_spec(hfg, axis)
    hfg_sm = _sm_view(hfg)
    S = hfg.n_shards

    def local(scale_l, hfg_l):
        dpi = _unstack_plan(hfg_l.dst_plan_i)
        dpb = _unstack_plan(hfg_l.dst_plan_b)
        s_i = dpi.gather_edges(scale_l) * dpi.slot_valid
        s_b = dpb.gather_edges(scale_l) * dpb.slot_valid
        return (dpi.reduce_slots_sum(s_i[:, None])
                + dpb.reduce_slots_sum(s_b[:, None]))[:, 0]

    sm = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(node_spec, plan_spec),
                           out_specs=node_spec, check_vma=False))

    def counts(edge_scale):
        return sm(_to_shard_scale(hfg, edge_scale), hfg_sm)

    return counts
