"""Pallas TPU kernels for the ELL fast path.

These fuse everything *after* the random src-gather (which XLA's ``take``
already runs near the random-access bandwidth bound) into single streaming
passes: broadcast of per-row queries over their budget slots, the
activation, the per-slot scaling, and the in-row reduction — one HBM read
of the gathered keys, one write of the row sums. On a v5e this class of
kernel sustains 330-390 GB/s vs ~45 GB/s for XLA's segment_sum and ~85 GB/s
for its fused gather+scatter loop (measured; see ``ops/ell.py`` docstring).

Replaces the N1-N3 DGL CUDA kernel roles from SURVEY §2b for the linear
aggregation types. Kernels are bucket-wise: each call handles one uniform
budget B, grid-iterating row tiles.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# slots per tile: the fwd kernel's working set is ~1 slot block + small
# row blocks, so it can afford 8192 slots (4MB f32 at H=128) double-buffered;
# the bwd kernel also materializes the g_z slot block and must stay at 4096
# to fit 16MB VMEM.
_SLOT_TILE_FWD = 8192
_SLOT_TILE_BWD = 4096


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _tile_rows(budget: int, slot_tile: int = _SLOT_TILE_BWD) -> int:
    # cap rows so the lane-padded (TR, B) scale block stays small and the
    # double-buffered VMEM footprint fits in 16MB; TR must be a multiple
    # of 8 (sublane divisibility of the (TR, H) blocks). The in-kernel
    # (TR, B, H) views tile their MIDDLE dim at sublane granularity, so a
    # non-multiple-of-8 budget occupies ceil(B/8)*8 sublanes of VMEM —
    # budget the tile on the PADDED width or a B=10 bucket blows the
    # 16 MB scoped limit (measured: "Scoped allocation with size 16.48M
    # ... exceeded scoped vmem limit" on the round-3 finer budgets).
    b_pad = max(-(-budget // 8) * 8, 1) if budget > 1 else 1
    return max((min(slot_tile // b_pad, 1024) // 8) * 8, 8)


def _cdiv(a, b):
    return -(-a // b)


def bucket_bcast_act_reduce(
    ekg: jax.Array,       # [R*B, H] gathered key-side values (slot order)
    eq_rows: jax.Array,   # [R, H]   per-row query values
    scale: jax.Array,     # [R, B] fused scale (0 = padding slot)
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
) -> jax.Array:
    """rows[r] = sum_b scale[r,b] * act(eq_rows[r] + ekg[r,b])  -> [R, H]."""
    R = eq_rows.shape[0]
    H = eq_rows.shape[1]
    B = budget
    TR = _tile_rows(B, _SLOT_TILE_FWD)
    grid = (_cdiv(R, TR),)

    def kernel(ekg_ref, eq_ref, sc_ref, out_ref):
        z = (ekg_ref[:].astype(jnp.float32).reshape(TR, B, H)
             + eq_ref[:][:, None, :])
        m = activation(z) * sc_ref[:][:, :, None]
        out_ref[:] = m.sum(axis=1)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, H), eq_rows.dtype),
        interpret=interpret,
    )(ekg, eq_rows, scale)


def bucket_bcast_act_reduce2(
    ekg: jax.Array,       # [R*B, H] gathered key-side values (slot order)
    eq_rows: jax.Array,   # [R, H]   per-row query values
    scale: jax.Array,     # [R, B] fused scale (0 = padding slot)
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
):
    """Dual-output forward for ELEMENTWISE activations:

        rows[r]  = sum_b scale[r,b] * act(z[r,b])
        srows[r] = sum_b scale[r,b] * act'(z[r,b])     (elementwise act')

    ``srows`` is the per-row derivative mass that lets the backward pass
    compute g_eq = g * finalize(srows) with ZERO extra edge-sized passes
    (the dst-side cotangent factorizes because dL/dz_e = scale_e *
    act'(z_e) * g[dst_e] and g[dst_e] is constant within a dst row).
    Only valid when ``activation`` has a diagonal Jacobian.
    """
    R, H = eq_rows.shape
    B = budget
    TR = _tile_rows(B)
    grid = (_cdiv(R, TR),)

    def kernel(ekg_ref, eq_ref, sc_ref, out_ref, s_ref):
        z = (ekg_ref[:].astype(jnp.float32).reshape(TR, B, H)
             + eq_ref[:][:, None, :])
        m, vjp = jax.vjp(activation, z)
        sc3 = sc_ref[:][:, :, None]
        out_ref[:] = (m * sc3).sum(axis=1)
        (d,) = vjp(jnp.broadcast_to(sc3, z.shape))
        s_ref[:] = d.sum(axis=1)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, H), eq_rows.dtype),
            jax.ShapeDtypeStruct((R, H), jnp.float32),
        ),
        interpret=interpret,
    )(ekg, eq_rows, scale)


def bucket_geq_reduce(
    ekg: jax.Array,       # [R*B, H]
    eq_rows: jax.Array,   # [R, H]
    scale: jax.Array,     # [R, B]
    g_rows: jax.Array,    # [R, H] cotangent of the row sums
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
) -> jax.Array:
    """dst-side backward for GENERAL (row-wise) activations: returns only
    g_eq_rows[r] = sum_b vjp(act, z[r,b])(scale[r,b] * g_rows[r]) — the
    old ``bucket_bcast_act_reduce_bwd`` minus the slot-sized g_z output
    (which the src-major pass now recomputes from node tables)."""
    R, H = eq_rows.shape
    B = budget
    TR = _tile_rows(B)
    grid = (_cdiv(R, TR),)

    def kernel(ekg_ref, eq_ref, sc_ref, g_ref, geq_ref):
        z = (ekg_ref[:].astype(jnp.float32).reshape(TR, B, H)
             + eq_ref[:][:, None, :])
        _, vjp = jax.vjp(activation, z)
        g_m = g_ref[:][:, None, :] * sc_ref[:][:, :, None]
        (g_z,) = vjp(g_m)
        geq_ref[:] = g_z.sum(axis=1)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, H), eq_rows.dtype),
        interpret=interpret,
    )(ekg, eq_rows, scale, g_rows)


def bucket_src_bwd(
    eqg: jax.Array,       # [R*B, H] dst-side values gathered per SRC slot
    ek_rows: jax.Array,   # [R, H]   per-src-row key values
    scale: jax.Array,     # [R, B]   scale in src-slot order
    gg: jax.Array,        # [R*B, H] output cotangent gathered per SRC slot
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
    gz_dtype=None,
):
    """src-major backward: recomputes z = eq[dst_e] + ek[src_e] in SRC
    slot order (all inputs gathered from fast node-sized tables — the
    slot-sized g_z permute this replaces costs ~3x more; see
    tools/gather_probe2.py) and reduces the cotangent by src:

        g_ek_rows[r] = sum_b vjp(act, z[r,b])(scale[r,b] * gg[r,b])

    With ``gz_dtype`` set, also emits the per-slot cotangent g_z (needed
    for edge-feature gradients)."""
    R, H = ek_rows.shape
    B = budget
    TR = _tile_rows(B)
    grid = (_cdiv(R, TR),)
    emit_gz = gz_dtype is not None

    def kernel(eqg_ref, ek_ref, sc_ref, gg_ref, *out_refs):
        z = (eqg_ref[:].astype(jnp.float32).reshape(TR, B, H)
             + ek_ref[:][:, None, :])
        _, vjp = jax.vjp(activation, z)
        g_m = (gg_ref[:].astype(jnp.float32).reshape(TR, B, H)
               * sc_ref[:][:, :, None])
        (g_z,) = vjp(g_m)
        out_refs[0][:] = g_z.sum(axis=1)
        if emit_gz:
            out_refs[1][:] = g_z.reshape(TR * B, H).astype(gz_dtype)

    out_specs = [pl.BlockSpec((TR, H), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    # gradients accumulate in f32 regardless of the (possibly bf16)
    # row-table dtype — the distributed paths pass bf16 ek/halo rows
    out_shape = [jax.ShapeDtypeStruct((R, H), jnp.float32)]
    if emit_gz:
        out_specs.append(pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((R * B, H), gz_dtype))

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(eqg, ek_rows, scale, gg)
    return res if emit_gz else (res[0], None)


def bucket_src_bwd_fused(
    both: jax.Array,      # [R*B, 2H] lane-concat of (eq[dst_e], g[dst_e])
    ek_rows: jax.Array,   # [R, H]   per-src-row key values
    scale: jax.Array,     # [R, B]   scale in src-slot order
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
    gz_dtype=None,
):
    """Fused-gather variant of :func:`bucket_src_bwd`: the caller gathers
    ONE [N, 2H] lane-concatenated node table (eq in lanes [0, H), the
    output cotangent g in lanes [H, 2H)) instead of two separate [N, H]
    takes — XLA's row gather is per-row-overhead-bound on TPU
    (ROADMAP: reorder experiment), so halving the row count nearly halves
    the gather cost. Requires H % 128 == 0 so the in-kernel lane split is
    vreg-aligned (the round-1 [N, 2, H] sublane-interleaved attempt
    regressed on exactly this: bf16 packs 2 sublanes/vreg and stride-2
    sublane selects need shuffles; a lane split at a 128 boundary is
    free)."""
    R, H = ek_rows.shape
    assert both.shape[1] == 2 * H and H % 128 == 0, (both.shape, H)
    B = budget
    TR = _tile_rows(B)
    grid = (_cdiv(R, TR),)
    emit_gz = gz_dtype is not None

    def kernel(both_ref, ek_ref, sc_ref, *out_refs):
        blk = both_ref[:].astype(jnp.float32).reshape(TR, B, 2 * H)
        z = blk[:, :, :H] + ek_ref[:][:, None, :]
        _, vjp = jax.vjp(activation, z)
        g_m = blk[:, :, H:] * sc_ref[:][:, :, None]
        (g_z,) = vjp(g_m)
        out_refs[0][:] = g_z.sum(axis=1)
        if emit_gz:
            out_refs[1][:] = g_z.reshape(TR * B, H).astype(gz_dtype)

    out_specs = [pl.BlockSpec((TR, H), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((R, H), jnp.float32)]
    if emit_gz:
        out_specs.append(pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((R * B, H), gz_dtype))

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, 2 * H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(both, ek_rows, scale)
    return res if emit_gz else (res[0], None)


def bucket_bcast_act_reduce_bwd(
    ekg: jax.Array,       # [R*B, H]
    eq_rows: jax.Array,   # [R, H]
    scale: jax.Array,     # [R, B]
    g_rows: jax.Array,    # [R, H] cotangent of the row sums
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
    gz_dtype=None,
):
    """Backward of :func:`bucket_bcast_act_reduce` (recompute-z scheme).

    NOT on the production path anymore: the ELL backward now uses
    ``bucket_geq_reduce`` + ``bucket_src_bwd`` (node-table-major; no
    slot-sized permute). Kept — with direct unit coverage — as the
    reference dst-major backward and for tools/ microbenchmarks.

    Returns (g_slots [R*B, H], g_eq_rows [R, H]) where
    g_slots = scale * act'(z) * g_rows[row]  (the cotangent of ekg, which
    the caller reduces by src via the mirrored plan) and
    g_eq_rows = sum_b g_slots[r, b].
    """
    R, H = eq_rows.shape
    B = budget
    TR = _tile_rows(B)
    grid = (_cdiv(R, TR),)
    gz_dtype = gz_dtype or eq_rows.dtype

    def kernel(ekg_ref, eq_ref, sc_ref, g_ref, gz_ref, geq_ref):
        z = (ekg_ref[:].astype(jnp.float32).reshape(TR, B, H)
             + eq_ref[:][:, None, :])
        _, vjp = jax.vjp(activation, z)
        g_m = g_ref[:][:, None, :] * sc_ref[:][:, :, None]
        (g_z,) = vjp(g_m)
        gz_ref[:] = g_z.reshape(TR * B, H).astype(gz_dtype)
        geq_ref[:] = g_z.sum(axis=1)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R * B, H), gz_dtype),
            jax.ShapeDtypeStruct((R, H), eq_rows.dtype),
        ),
        interpret=interpret,
    )(ekg, eq_rows, scale, g_rows)


# the fused-edge kernels carry the egr block (lane-padded to 128 in
# VMEM regardless of De) plus the in-kernel projection result on top of
# the linear kernels' working set — measured on v5e at arxiv scale: the
# default 4096-slot tile overflows scoped VMEM by ~0.7 MB at a B=14
# bucket ("Scoped allocation 16.67M ... limit 16.00M"), so they budget
# 2048 slots per tile like the max kernels
_SLOT_TILE_EDGE = 2048


def bucket_edge_act_reduce2(
    ekg: jax.Array,       # [R*B, H] gathered key-side values (slot order)
    egr: jax.Array,       # [R*B, De] raw edge-basis rows (slot order)
    eq_rows: jax.Array,   # [R, H]   per-row query values
    scale: jax.Array,     # [R, B] fused scale (0 = padding slot)
    w_e: jax.Array,       # [De, H] edge projection (reference linear_edge)
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
):
    """Fused-edge dual-output forward for ELEMENTWISE activations
    (SIREConv math, reference ``models/conv.py:111``):

        z[r,b]   = eq_rows[r] + ekg[r,b] + egr[r,b] @ w_e
        rows[r]  = sum_b scale[r,b] * act(z[r,b])
        srows[r] = sum_b scale[r,b] * act'(z[r,b])

    The edge projection runs on the MXU *inside* the kernel, so only the
    narrow [S, De] basis crosses HBM — never an [S, H] edge-slot table.
    The basis is anything the edge encoder is affine in: raw float
    features for the default ``linear_edge``, a one-hot of discrete bond
    types for the Embedding encoder (SIREConv2), a concatenation of
    one-hots for OGB's BondEncoder.
    """
    R, H = eq_rows.shape
    De = egr.shape[1]
    B = budget
    TR = _tile_rows(B, _SLOT_TILE_EDGE)
    grid = (_cdiv(R, TR),)

    def kernel(ekg_ref, egr_ref, eq_ref, sc_ref, we_ref, out_ref, s_ref):
        e = jax.lax.dot_general(
            egr_ref[:].astype(jnp.float32), we_ref[:].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        z = ((ekg_ref[:].astype(jnp.float32) + e).reshape(TR, B, H)
             + eq_ref[:][:, None, :])
        m, vjp = jax.vjp(activation, z)
        sc3 = sc_ref[:][:, :, None]
        out_ref[:] = (m * sc3).sum(axis=1)
        (d,) = vjp(jnp.broadcast_to(sc3, z.shape))
        s_ref[:] = d.sum(axis=1)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR * B, De), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((De, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, H), eq_rows.dtype),
            jax.ShapeDtypeStruct((R, H), jnp.float32),
        ),
        interpret=interpret,
    )(ekg, egr, eq_rows, scale, w_e)


def bucket_edge_src_bwd(
    eqg: jax.Array,       # [R*B, H] dst-side values gathered per SRC slot
    egr: jax.Array,       # [R*B, De] raw edge-basis rows (src-slot order)
    ek_rows: jax.Array,   # [R, H]   per-src-row key values
    scale: jax.Array,     # [R, B]   scale in src-slot order
    gg: jax.Array,        # [R*B, H] output cotangent gathered per SRC slot
    w_e: jax.Array,       # [De, H]
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
):
    """src-major backward of the fused-edge path. Recomputes
    z = eq[dst_e] + ek[src_e] + egr_e @ w_e in src-slot order and emits

        g_ek_rows[r] = sum_b g_z[r,b]          (reduce by src)
        g_we         = sum_slots egr[s]^T g_z[s]  (accumulated in-kernel
                                                   across grid steps)

    where g_z = vjp(act, z)(scale * gg). The [E_pad, H] per-edge
    cotangent the unfused path materializes (and XLA schedules
    pathologically at full-graph scale — ROADMAP round 4) never exists:
    the edge projection's parameter gradient is reduced per SLOT on the
    MXU instead."""
    R, H = ek_rows.shape
    De = egr.shape[1]
    B = budget
    TR = _tile_rows(B, _SLOT_TILE_EDGE)
    grid = (_cdiv(R, TR),)

    def kernel(eqg_ref, egr_ref, ek_ref, sc_ref, gg_ref, we_ref,
               gek_ref, gwe_ref):
        er = egr_ref[:].astype(jnp.float32)
        e = jax.lax.dot_general(
            er, we_ref[:].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        z = ((eqg_ref[:].astype(jnp.float32) + e).reshape(TR, B, H)
             + ek_ref[:][:, None, :])
        _, vjp = jax.vjp(activation, z)
        g_m = (gg_ref[:].astype(jnp.float32).reshape(TR, B, H)
               * sc_ref[:][:, :, None])
        (g_z,) = vjp(g_m)
        # the grid's last tile may run past R: per-row outputs get sliced
        # away by the caller, but the gwe reduction would sum the padded
        # tail's garbage — mask rows beyond R explicitly
        rows_left = R - pl.program_id(0) * TR
        rmask = jax.lax.broadcasted_iota(jnp.int32, (TR, 1, 1), 0) \
            < rows_left
        g_z = jnp.where(rmask, g_z, 0.0)  # where, not *: 0 * NaN = NaN
        gek_ref[:] = g_z.sum(axis=1)
        # mask er too: a garbage tail in EITHER GEMM operand would
        # poison the accumulation
        smask = jax.lax.broadcasted_iota(jnp.int32, (TR * B, 1), 0) \
            < rows_left * B
        gwe_part = jax.lax.dot_general(
            jnp.where(smask, er, 0.0), g_z.reshape(TR * B, H),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            gwe_ref[:] = jnp.zeros_like(gwe_ref)

        gwe_ref[:] += gwe_part

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR * B, De), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((De, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((De, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, H), jnp.float32),
            jax.ShapeDtypeStruct((De, H), jnp.float32),
        ),
        interpret=interpret,
    )(eqg, egr, ek_rows, scale, gg, w_e)


# ----------------------------------------------------------------------
# Max-aggregation bucket kernels (per-edge W_R GEMM fused with the
# masked max reduce — reference models/conv.py:47)
# ----------------------------------------------------------------------

# the max kernels hold (TR, B, H) AND (TR, B, O) f32 intermediates plus
# the W blocks, so they budget fewer slots per tile than the linear ones
_SLOT_TILE_MAX = 2048


def bucket_max_gemm_fwd(
    ekg: jax.Array,       # [R*B, H] gathered pre-activation key side
    eq_rows: jax.Array,   # [R, H]
    scale: jax.Array,     # [R, B]  (0 = invalid/padding slot)
    w: jax.Array,         # [H, O]  per-edge W_R
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
) -> jax.Array:
    """rows[r] = max_b { act(eq[r] + ekg[r,b]) @ w  if scale[r,b] > 0 }
    (invalid slots -> dtype min), fused act + MXU GEMM + masked reduce.
    Bias is NOT added here — max(m + b) == max(m) + b per output, so the
    builder hoists it to the node level."""
    R, H = eq_rows.shape
    O = w.shape[1]
    B = budget
    TR = _tile_rows(B, _SLOT_TILE_MAX)
    grid = (_cdiv(R, TR),)

    def kernel(ekg_ref, eq_ref, sc_ref, w_ref, out_ref):
        z = (ekg_ref[:].astype(jnp.float32).reshape(TR, B, H)
             + eq_ref[:][:, None, :])
        a = activation(z)
        m = jax.lax.dot_general(
            a.reshape(TR * B, H), w_ref[:].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(TR, B, O)
        neg = jnp.finfo(jnp.float32).min
        valid = sc_ref[:][:, :, None] > 0
        out_ref[:] = jnp.where(valid, m, neg).max(axis=1)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, O), jnp.float32),
        interpret=interpret,
    )(ekg, eq_rows, scale, w)


def bucket_max_wincount(
    ekg: jax.Array,       # [R*B, H]
    eq_rows: jax.Array,   # [R, H]
    scale: jax.Array,     # [R, B]
    out_rows: jax.Array,  # [R, O] the KEY-level max (pre-bias), per row
    w: jax.Array,         # [H, O]
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
) -> jax.Array:
    """wincnt[r, o] = #slots b with m[r,b,o] == out_rows[r,o] and
    scale[r,b] > 0. Summed over a key's rows by the caller, this is the
    tie count the backward divides the cotangent by (exactly the XLA
    path's tie-splitting semantics)."""
    R, H = eq_rows.shape
    O = w.shape[1]
    B = budget
    TR = _tile_rows(B, _SLOT_TILE_MAX)
    grid = (_cdiv(R, TR),)

    def kernel(ekg_ref, eq_ref, sc_ref, or_ref, w_ref, cnt_ref):
        z = (ekg_ref[:].astype(jnp.float32).reshape(TR, B, H)
             + eq_ref[:][:, None, :])
        a = activation(z)
        m = jax.lax.dot_general(
            a.reshape(TR * B, H), w_ref[:].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(TR, B, O)
        valid = sc_ref[:][:, :, None] > 0
        win = (m == or_ref[:][:, None, :]) & valid
        cnt_ref[:] = win.astype(jnp.float32).sum(axis=1)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, O), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, O), jnp.float32),
        interpret=interpret,
    )(ekg, eq_rows, scale, out_rows, w)


def bucket_max_gemm_bwd(
    ekg: jax.Array,       # [R*B, H]
    eq_rows: jax.Array,   # [R, H]
    scale: jax.Array,     # [R, B]
    out_rows: jax.Array,  # [R, O] key-level max (pre-bias), per row
    gsc_rows: jax.Array,  # [R, O] cotangent / tie count, per row
    w: jax.Array,         # [H, O]
    budget: int,
    activation: Callable[[jax.Array], jax.Array],
    interpret: bool = False,
    gz_dtype=None,
):
    """Backward of the fused max path. Recomputes z, a, m per bucket and
    routes the (already tie-divided) cotangent to winning slots:

        g_m  = 1[m == out_rows] * valid * gsc_rows
        g_w += a^T g_m            (accumulated in-kernel, MXU)
        g_z  = vjp(act, z)(g_m w^T)

    Returns (g_eq_rows [R, H] = sum_b g_z, g_z [R*B, H], g_w [H, O]).
    g_z feeds the src-plan permute for g_ek (one slot-sized take — the
    max path's single remaining slot permute) and, with edge features,
    the per-edge cotangent."""
    R, H = eq_rows.shape
    O = w.shape[1]
    B = budget
    TR = _tile_rows(B, _SLOT_TILE_MAX)
    grid = (_cdiv(R, TR),)
    gz_dtype = gz_dtype or jnp.float32

    def kernel(ekg_ref, eq_ref, sc_ref, or_ref, gr_ref, w_ref,
               geq_ref, gz_ref, gw_ref):
        z = (ekg_ref[:].astype(jnp.float32).reshape(TR, B, H)
             + eq_ref[:][:, None, :])
        a, vjp = jax.vjp(activation, z)
        af = a.reshape(TR * B, H)
        wf = w_ref[:].astype(jnp.float32)
        m = jax.lax.dot_general(
            af, wf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(TR, B, O)
        valid = sc_ref[:][:, :, None] > 0
        win = ((m == or_ref[:][:, None, :]) & valid).astype(jnp.float32)
        # mask the grid's padded tail rows: their garbage would pollute
        # the in-kernel g_w reduction (per-row outputs are sliced away;
        # where, not *, because 0 * NaN = NaN)
        rows_left = R - pl.program_id(0) * TR
        rmask = jax.lax.broadcasted_iota(jnp.int32, (TR, 1, 1), 0) \
            < rows_left
        g_m = jnp.where(rmask, win * gr_ref[:][:, None, :],
                        0.0).reshape(TR * B, O)
        smask = jax.lax.broadcasted_iota(jnp.int32, (TR * B, 1), 0) \
            < rows_left * B
        gw_part = jax.lax.dot_general(
            jnp.where(smask, af, 0.0), g_m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g_a = jax.lax.dot_general(
            g_m, wf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(TR, B, H)
        (g_z,) = vjp(g_a)
        geq_ref[:] = g_z.sum(axis=1)
        gz_ref[:] = g_z.reshape(TR * B, H).astype(gz_dtype)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            gw_ref[:] = jnp.zeros_like(gw_ref)

        gw_ref[:] += gw_part

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, O), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, O), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, H), jnp.float32),
            jax.ShapeDtypeStruct((R * B, H), gz_dtype),
            jax.ShapeDtypeStruct((H, O), jnp.float32),
        ),
        interpret=interpret,
    )(ekg, eq_rows, scale, out_rows, gsc_rows, w)


def bucket_scaled_reduce(
    values: jax.Array,    # [R*B, H]
    scale: jax.Array,     # [R, B]
    budget: int,
    interpret: bool = False,
) -> jax.Array:
    """rows[r] = sum_b scale[r,b] * values[r,b] -> [R, H] (the plain
    bucketed segment-sum; used for the src-side reduction in backward)."""
    S, H = values.shape
    B = budget
    R = S // B
    TR = _tile_rows(B)
    grid = (_cdiv(R, TR),)

    def kernel(v_ref, sc_ref, out_ref):
        v = (v_ref[:].astype(jnp.float32).reshape(TR, B, H)
             * sc_ref[:][:, :, None])
        out_ref[:] = v.sum(axis=1)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, H), jnp.float32),
        interpret=interpret,
    )(values, scale)
