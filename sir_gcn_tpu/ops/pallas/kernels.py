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
