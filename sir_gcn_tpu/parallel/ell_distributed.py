"""Distributed ELL fast path: edge-partitioned full-graph SIR aggregation
over a ``graph`` mesh axis with the scatter-free slot machinery on every
shard (SURVEY §2c P2-P3, fast-path edition).

Layout (host-built once):
  * nodes split into equal contiguous ranges (dst-sorted edges => each
    shard's incoming edges are one contiguous slice of the edge arrays);
  * per shard: a dst :class:`ReducePlan` over LOCAL keys and a src plan
    over GLOBAL keys (for the backward ek reduction);
  * plans harmonized to one static structure so shard_map runs a single
    program over stacked leaves.

Step (inside shard_map):
  ek_full = all_gather(ek_shard)        # the halo exchange, over ICI
  out_shard = local scatter-free SIR aggregation (slots reference
              global src ids into ek_full; everything else local)
Backward (hand-written, also scatter-free):
  g_ek partials per shard reduced by GLOBAL src -> psum_scatter back to
  owners (the transpose of the all_gather); g_eq purely local.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import GraphBatch
from ..ops.ell import ReducePlan, build_reduce_plan, harmonize_reduce_plans


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedFastGraph:
    """Stacked per-shard plans (leading axis = shard)."""

    dst_plan: ReducePlan          # local dst keys; leaves [S, ...]
    src_plan: ReducePlan          # global src keys; leaves [S, ...]
    slot_srcnode: jax.Array       # [S, S1] global src id per dst slot
    src_from_dst_slot: jax.Array  # [S, S1s] dst-slot index per src slot
    slot_scale: jax.Array         # [S, S1] static scale (sym/mean/valid)
    # node-table-major backward (Pallas variant): LOCAL dst id and static
    # scale per SRC slot
    src_slot_dstnode: jax.Array   # [S, S1s]
    src_slot_scale: jax.Array     # [S, S1s]
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    n_local: int = dataclasses.field(metadata=dict(static=True))


def _stack_plans(plans):
    leaves = [jax.tree_util.tree_leaves(p) for p in plans]
    stacked = [jnp.stack(xs) for xs in zip(*leaves)]
    treedef = jax.tree_util.tree_structure(plans[0])
    return jax.tree_util.tree_unflatten(treedef, stacked)


def build_sharded_fast_graph(
    graph: GraphBatch,
    n_shards: int,
    agg_type: str = "sum",
    max_budget: int = 256,
) -> ShardedFastGraph:
    """Host-side: per-shard harmonized plans for a dst-sorted GraphBatch.

    ``agg_type`` folds the static per-edge scale: 'sym' degree norms,
    'mean' 1/in-degree, 'sum' plain validity. (Dynamic DropEdge masks are
    not supported on this path yet — see ROADMAP.)
    """
    assert graph.n_pad % n_shards == 0
    n_local = graph.n_pad // n_shards
    from ..graph import host_array
    from ..ops.ell import reset_plan_timings, static_edge_scale

    reset_plan_timings()
    src = np.asarray(host_array(graph, "src"), np.int64)
    dst = np.asarray(host_array(graph, "dst"), np.int64)
    valid = np.asarray(host_array(graph, "edge_mask"), bool)

    escale = static_edge_scale(agg_type, src, dst, valid,
                               host_array(graph, "in_deg"),
                               host_array(graph, "out_deg")
                               ).astype(np.float32)

    # dst-sorted => shard s owns the contiguous edge slice with
    # dst in [s*n_local, (s+1)*n_local)
    bounds = np.searchsorted(dst, np.arange(n_shards + 1) * n_local)

    from ..ops.ell import uniform_stage2

    dplans, splans, dargs, sargs = [], [], [], []
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        d_l = dst[lo:hi] - s * n_local
        s_g = src[lo:hi]
        v_l = valid[lo:hi]
        dplans.append(build_reduce_plan(d_l, v_l, n_local, max_budget))
        splans.append(build_reduce_plan(s_g, v_l, graph.n_pad,
                                        max_budget))
        dargs.append((d_l, v_l, n_local, max_budget))
        sargs.append((s_g, v_l, graph.n_pad, max_budget))

    dplans = harmonize_reduce_plans(uniform_stage2(dplans, dargs))
    splans = harmonize_reduce_plans(uniform_stage2(splans, sargs))

    # re-derive per-slot arrays in the harmonized layouts
    def regather(plans_h, per_edge):
        out = []
        for s, p in enumerate(plans_h):
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            se = np.asarray(p.slot_edge)
            sv = np.asarray(p.slot_valid) > 0
            vals = per_edge[s]
            res = np.zeros(p.num_slots, vals.dtype)
            if hi > lo:
                res[sv] = vals[se[sv]]
            out.append(res)
        return np.stack(out)

    src_per_shard = [src[int(bounds[s]):int(bounds[s + 1])]
                     for s in range(n_shards)]
    esc_per_shard = [escale[int(bounds[s]):int(bounds[s + 1])]
                     for s in range(n_shards)]
    dstl_per_shard = [dst[int(bounds[s]):int(bounds[s + 1])] - s * n_local
                      for s in range(n_shards)]
    slot_srcnode = regather(dplans, src_per_shard)
    slot_scale = regather(dplans, esc_per_shard)
    src_slot_dstnode = regather(splans, dstl_per_shard)
    src_slot_scale = regather(splans, esc_per_shard)

    # dst-slot index per src slot, in harmonized layouts
    d2s = []
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        dp, sp = dplans[s], splans[s]
        e2d = np.zeros(max(hi - lo, 1), np.int64)
        dvalid = np.asarray(dp.slot_valid) > 0
        e2d[np.asarray(dp.slot_edge)[dvalid]] = np.nonzero(dvalid)[0]
        se = np.asarray(sp.slot_edge)
        svalid = np.asarray(sp.slot_valid) > 0
        res = np.zeros(sp.num_slots, np.int64)
        if hi > lo:
            res[svalid] = e2d[se[svalid]]
        d2s.append(res)

    return ShardedFastGraph(
        dst_plan=_stack_plans(dplans),
        src_plan=_stack_plans(splans),
        slot_srcnode=jnp.asarray(slot_srcnode, jnp.int32),
        src_from_dst_slot=jnp.asarray(np.stack(d2s), jnp.int32),
        slot_scale=jnp.asarray(slot_scale),
        src_slot_dstnode=jnp.asarray(src_slot_dstnode, jnp.int32),
        src_slot_scale=jnp.asarray(src_slot_scale),
        n_shards=n_shards,
        n_local=n_local,
    )


def _unstack_plan(plan: ReducePlan) -> ReducePlan:
    return jax.tree_util.tree_map(lambda x: x[0], plan)


def make_sharded_sir_aggregate(
    sfg: ShardedFastGraph,
    activation: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    axis: str = "graph",
    use_pallas: bool = None,
    feat_width: int = 16,
):
    """Build ``f(eq_sharded, ek_sharded) -> out_sharded`` (all [N_pad, H]
    row-sharded over ``axis``) with a hand-written scatter-free backward:
    all_gather forward, psum_scatter of per-shard src-keyed partials
    backward.

    ``use_pallas=None`` auto-selects the fused-kernel variant
    (:func:`make_sharded_sir_aggregate_pallas`) on TPU for elementwise,
    closure-free activations — giving each shard the same per-chip kernel
    quality as the single-device fast path."""
    if use_pallas is None:
        from ..ops.ell import _activation_info
        from ..ops.pallas import pallas_available

        # probe at the real feature width when the caller provides it
        # (a width-dependent activation could classify differently at a
        # fixed small width)
        elem, ok = _activation_info(activation, feat_width)
        use_pallas = pallas_available() and elem and ok
    if use_pallas:
        return make_sharded_sir_aggregate_pallas(sfg, activation, mesh,
                                                 axis)
    S = sfg.n_shards
    node_spec = P(axis)
    plan_spec = jax.tree_util.tree_map(lambda _: P(axis), sfg)

    def local_fwd(eq_l, ek_l, sfg_l):
        dplan = _unstack_plan(sfg_l.dst_plan)
        ek_full = jax.lax.all_gather(ek_l, axis, axis=0, tiled=True)
        z = (dplan.spread(eq_l)
             + jnp.take(ek_full, sfg_l.slot_srcnode[0], axis=0))
        m = activation(z) * sfg_l.slot_scale[0][:, None]
        return dplan.reduce_slots_sum(m)

    def local_bwd(g_l, eq_l, ek_l, sfg_l):
        dplan = _unstack_plan(sfg_l.dst_plan)
        splan = _unstack_plan(sfg_l.src_plan)
        ek_full = jax.lax.all_gather(ek_l, axis, axis=0, tiled=True)
        z = (dplan.spread(eq_l)
             + jnp.take(ek_full, sfg_l.slot_srcnode[0], axis=0))
        _, act_vjp = jax.vjp(activation, z)
        g_m = dplan.spread(g_l) * sfg_l.slot_scale[0][:, None]
        (g_z,) = act_vjp(g_m)
        g_eq = dplan.reduce_slots_sum(g_z * dplan.slot_valid[:, None])
        g_z_src = (jnp.take(g_z, sfg_l.src_from_dst_slot[0], axis=0)
                   * splan.slot_valid[:, None])
        g_ek_full = splan.reduce_slots_sum(g_z_src)  # [N_pad, H] partial
        g_ek = jax.lax.psum_scatter(g_ek_full, axis, scatter_dimension=0,
                                    tiled=True)
        return g_eq, g_ek

    fwd_sm = jax.jit(shard_map(
        local_fwd, mesh=mesh,
        in_specs=(node_spec, node_spec, plan_spec),
        out_specs=node_spec, check_vma=False))
    bwd_sm = jax.jit(shard_map(
        local_bwd, mesh=mesh,
        in_specs=(node_spec, node_spec, node_spec, plan_spec),
        out_specs=(node_spec, node_spec), check_vma=False))

    @jax.custom_vjp
    def f(eq, ek):
        return fwd_sm(eq, ek, sfg)

    def f_fwd(eq, ek):
        return fwd_sm(eq, ek, sfg), (eq, ek)

    def f_bwd(res, g):
        eq, ek = res
        return bwd_sm(g, eq, ek, sfg)

    f.defvjp(f_fwd, f_bwd)
    return f


def make_sharded_sir_aggregate_pallas(
    sfg: ShardedFastGraph,
    activation: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    axis: str = "graph",
    edge_dtype=None,
    interpret: bool = False,
    elide_unit_collectives: bool = True,
    per_bucket_takes: bool = True,
):
    """Fused-kernel variant of :func:`make_sharded_sir_aggregate` for
    ELEMENTWISE activations: each shard's local compute runs the same
    Pallas bucket kernels as the single-device fast path (dual-output
    forward emitting the derivative-mass sbar, node-table-major src-major
    backward), so per-chip throughput matches the single-chip path while
    the collectives stay all_gather (fwd) / psum_scatter (bwd).
    ``edge_dtype=None`` follows the global ``set_edge_dtype`` setting.

    Comms notes (round 4): the halo ``all_gather`` runs in the EDGE dtype
    (the gathered table only ever feeds bf16 slot gathers and the
    f32-accumulating kernels, so carrying it bf16 halves the collective
    bytes with numerics identical to the single-device bf16 pipeline);
    the cotangent ``psum_scatter`` stays f32 (it accumulates). On a
    1-device mesh axis both collectives are provably identities and are
    elided at trace time (``elide_unit_collectives=False`` restores the
    literal program for A/B measurement — tools/r4bench.py).

    ``per_bucket_takes`` (default ON) is the round-5 pre-registered
    scheduling experiment (VERDICT r4 item 5), and it CLOSED the
    residual: instead of gathering the full [S, H] slot table once and
    slicing it per budget bucket (whose sublane-misaligned slice
    boundaries XLA realigns with per-bucket copies in this program
    shape — the r4 HLO finding), slice the int32 index vector per
    bucket and issue one take per bucket, forcing the gather to fuse
    into each kernel input in any program shape. Total gathered rows
    identical. Measured same-session on the v5e (tools/r5sched.py,
    2026-08-21): single 13.98 ms/iter, sharded@1 16.25 ms (86.0%) with
    the big-table form -> **14.31 ms (97.7%)** with per-bucket takes."""
    from ..ops.ell import _bucket_offsets
    from ..ops.message_passing import get_edge_dtype
    from ..ops.pallas import bucket_bcast_act_reduce2, bucket_src_bwd

    if edge_dtype is None:
        edge_dtype = get_edge_dtype()
    node_spec = P(axis)
    plan_spec = jax.tree_util.tree_map(lambda _: P(axis), sfg)
    offs_d = _bucket_offsets(sfg.dst_plan.buckets1)
    offs_s = _bucket_offsets(sfg.src_plan.buckets1)
    unit = elide_unit_collectives and mesh.shape[axis] == 1

    def cast(x):
        return x.astype(edge_dtype) if edge_dtype is not None else x

    def gather_full(ek_l):
        if unit:
            return cast(ek_l)
        return jax.lax.all_gather(cast(ek_l), axis, axis=0, tiled=True)

    def scatter_back(g_full):
        if unit:
            return g_full
        return jax.lax.psum_scatter(g_full, axis, scatter_dimension=0,
                                    tiled=True)

    def cat(xs):
        return jnp.concatenate(xs) if len(xs) > 1 else xs[0]

    def lane_pad(x):
        """Pad the feature dim to 128 INSIDE the (possibly shard_map'd)
        program — exact for elementwise sigma (the single-device
        ``padded()`` argument), and placed here so XLA's pad-sinking /
        fusion rewrites see the pads next to the gathers they feed
        (an outer pad across a region boundary compiled to a 128-wide
        [S, H] gather + 5x the fusion count — tools/hlo_diff.py)."""
        from ..ops.ell import _round_up

        h = x.shape[-1]
        hp = _round_up(h, 128)
        if hp == h:
            return x
        return jnp.pad(x, ((0, 0), (0, hp - h)))

    def bucket_slices(table, idx, offs):
        """Per-bucket gathered blocks: either slice one big take (the
        default program shape) or take per bucket-sliced indices
        (``per_bucket_takes`` — see docstring)."""
        if per_bucket_takes:
            return [jnp.take(table, idx[so:so + b * nr], axis=0)
                    for b, nr, so, ro in offs]
        full = jnp.take(table, idx, axis=0)
        return [full[so:so + b * nr] for b, nr, so, ro in offs]

    def local_fwd2(eq_l, ek_l, sfg_l):
        h = eq_l.shape[-1]
        eq_l, ek_l = lane_pad(eq_l), lane_pad(ek_l)
        dplan = _unstack_plan(sfg_l.dst_plan)
        ek_full = gather_full(ek_l)
        ekgs = bucket_slices(ek_full, sfg_l.slot_srcnode[0], offs_d)
        eq_rows = jnp.take(eq_l, dplan.row_key, axis=0)
        s = sfg_l.slot_scale[0].astype(jnp.float32)
        rows, srows = [], []
        for (b, nr, so, ro), ekg_b in zip(offs_d, ekgs):
            r, sr = bucket_bcast_act_reduce2(
                ekg_b, eq_rows[ro:ro + nr],
                s[so:so + b * nr].reshape(nr, b), b, activation,
                interpret=interpret)
            rows.append(r)
            srows.append(sr)
        return (dplan.finalize_rows_sum(cat(rows))[:, :h],
                dplan.finalize_rows_sum(cat(srows))[:, :h])

    def local_bwd(g_l, eq_l, ek_l, sfg_l):
        h = eq_l.shape[-1]
        g_l, eq_l, ek_l = lane_pad(g_l), lane_pad(eq_l), lane_pad(ek_l)
        splan = _unstack_plan(sfg_l.src_plan)
        eqgs = bucket_slices(cast(eq_l), sfg_l.src_slot_dstnode[0],
                             offs_s)
        ggs = bucket_slices(cast(g_l), sfg_l.src_slot_dstnode[0], offs_s)
        # recomputes the forward's gather_full — CSE'd when fwd+bwd
        # compile into one step program
        ek_full = gather_full(ek_l)
        ek_rows = jnp.take(ek_full, splan.row_key, axis=0)
        s = sfg_l.src_slot_scale[0].astype(jnp.float32)
        rows = []
        for (b, nr, so, ro), eqg_b, gg_b in zip(offs_s, eqgs, ggs):
            r, _ = bucket_src_bwd(
                eqg_b, ek_rows[ro:ro + nr],
                s[so:so + b * nr].reshape(nr, b),
                gg_b, b, activation, interpret=interpret)
            rows.append(r)
        g_ek_full = splan.finalize_rows_sum(cat(rows))[:, :h]
        return scatter_back(g_ek_full)

    # No jax.jit wrapper in either branch: a nested pjit is an
    # optimization boundary (blocked the pad-sink rewrite and shattered
    # fusions — tools/hlo_diff.py); call sites trace these under the
    # caller's jit, where they inline.
    if unit:
        # a 1-device mesh axis needs no manual-sharding region at all
        fwd2_sm, bwd_sm = local_fwd2, local_bwd
    else:
        fwd2_sm = shard_map(
            local_fwd2, mesh=mesh,
            in_specs=(node_spec, node_spec, plan_spec),
            out_specs=(node_spec, node_spec), check_vma=False)
        bwd_sm = shard_map(
            local_bwd, mesh=mesh,
            in_specs=(node_spec, node_spec, node_spec, plan_spec),
            out_specs=node_spec, check_vma=False)

    @jax.custom_vjp
    def f(eq, ek):
        return fwd2_sm(eq, ek, sfg)[0]

    def f_fwd(eq, ek):
        out, sbar = fwd2_sm(eq, ek, sfg)
        return out, (eq, ek, sbar)

    def f_bwd(res, g):
        eq, ek, sbar = res
        g_eq = g * sbar  # dst-side cotangent factorizes (elementwise act)
        g_ek = bwd_sm(g, eq, ek, sfg)
        return g_eq, g_ek

    f.defvjp(f_fwd, f_bwd)
    return f
