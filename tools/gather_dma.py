"""Per-row DMA gather microbench (run alone on the TPU).

Question (ROADMAP 'fuse the src gather into the kernels'): can a Pallas
kernel that issues one async DMA per gathered row — scalar-prefetched
indices, INFLIGHT-deep pipelining — beat XLA's row `take`?  If yes, the
ELL backward can read node tables directly instead of materializing the
[S, H] gathered operands in HBM (saving a full write+read round trip,
~2.8 GB/layer).  If no, the backward is take-bandwidth-bound and the
remaining step-time is a hardware floor.

MEASURED VERDICT (v5e, 2026-08-21): a TRUE per-row DMA is not
expressible — Mosaic requires HBM slices aligned to the (8, 128) tile
("Slice shape along dimension 0 must be aligned to tiling (8), but
is 1" at dma_start lowering). The only implementable form DMAs the
8-row-aligned tile containing each row (8x byte amplification at
H=128 bf16), measured here as `pallas 8-row-tile dma gather`. See
ROADMAP for the recorded numbers.

Measures, in one chained jit each:
  * XLA gather-reduce (take + sum, fused — no materialization): the
    pure random-read lower bound;
  * XLA take + separate consumer (materialized, like the real pipeline);
  * the 8-row-aligned tile-DMA gather kernel (accumulates rows in VMEM).
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 169_984
    S = 2_752_512
    H = 128            # one node-table row (bf16: 256B)
    T = 4096           # rows per grid tile
    INFLIGHT = 16

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32),
                      jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, S).astype(np.int32))
    # chip-health probe: a trivial computation must return promptly
    t0 = time.time()
    v = float(jnp.sum(tbl[:8].astype(jnp.float32)))
    log(f"probe sum={v:.2f} in {time.time() - t0:.1f}s")
    G = S // T

    # NOTE a full-array scalar prefetch (PrefetchScalarGridSpec) is
    # impossible at this scale: the 2.75M-index operand is 11 MB and SMEM
    # is 1 MB ("Allocation (size=11010048) would exceed memory
    # (size=1048576), space=smem" — measured). Indices are instead
    # streamed as SMEM-BLOCKED per-tile inputs (16 KB/tile).
    def kernel(idx_ref, tbl_ref, out_ref, scratch, acc, sems):
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, H), 0)

        def dma_for(r, slot):
            # single-row HBM slices are rejected by Mosaic (tile-aligned
            # only); DMA the full 8-row tile containing the row
            tile = (idx_ref[r] // 8) * 8
            return pltpu.make_async_copy(
                tbl_ref.at[pl.ds(tile, 8)], scratch.at[slot],
                sems.at[slot])

        for s in range(INFLIGHT):
            dma_for(s, s).start()
        acc[:] = jnp.zeros_like(acc)

        def body(c, carry):
            b = c * INFLIGHT
            for s in range(INFLIGHT):
                dma_for(b + s, s).wait()
                # select the wanted row out of the 8-row tile (VPU
                # mask+reduce; broadcast the sum over all 8 acc rows)
                want = idx_ref[b + s] % 8
                row = jnp.where(sub_iota == want,
                                scratch[s].astype(jnp.float32), 0.0
                                ).sum(axis=0, keepdims=True)
                acc[:] = acc[:] + row
                nxt = b + INFLIGHT + s

                @pl.when(nxt < T)
                def _(nxt=nxt, s=s):
                    dma_for(nxt, s).start()
            return carry

        jax.lax.fori_loop(0, T // INFLIGHT, body, 0)
        # out block is (1, 8, H) — Pallas requires the last two block dims
        # divisible by (8, 128); all 8 sublanes carry the same sum
        out_ref[0] = acc[:]

    gather_dma_p = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((T,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((INFLIGHT, 8, H), jnp.bfloat16),
            pltpu.VMEM((8, H), jnp.float32),
            pltpu.SemaphoreType.DMA((INFLIGHT,)),
        ],
        out_shape=jax.ShapeDtypeStruct((G, 8, H), jnp.float32),
    )

    def gather_dma(ix, t):
        return gather_dma_p(ix, t)

    steps = 10

    def timed(name, one_pass):
        @jax.jit
        def run(tbl, idx):
            def body(i, carry):
                t, s = carry
                # data-dependent no-op keeps the pass inside the loop
                # (jnp.roll with a dynamic shift trips a jax lowering
                # bug under pallas_call; max with an always-smaller
                # value is equivalent and cheap)
                ix = jnp.maximum(idx, i - jnp.int32(2_000_000_000))
                out = one_pass(t, ix)
                return (t, s + out)
            _, s = jax.lax.fori_loop(0, steps, body,
                                     (tbl, jnp.zeros((), jnp.float32)))
            return s

        log(f"[start] {name}")
        t0 = time.time()
        float(run(tbl, idx))
        log(f"[compile] {name}: {time.time() - t0:.0f}s")
        t0 = time.time()
        float(run(tbl, idx))
        dt = (time.time() - t0) / steps
        gbs = S * H * 2 / dt / 1e9
        log(f"{name:34s} {dt * 1e3:8.2f} ms/pass  {gbs:6.0f} GB/s")

    # DMA kernel first — it is the open question; the take baselines are
    # re-measured after (ROADMAP already has take numbers from
    # gather_probe2 if a hang cuts this short).
    timed("pallas 8-row-tile dma gather",
          lambda t, ix: gather_dma(ix, t).sum())
    timed("xla take+sum (fused, no writeback)",
          lambda t, ix: jnp.take(t, ix, axis=0).astype(jnp.float32).sum())
    timed("xla take -> materialized -> sum",
          lambda t, ix: jax.lax.optimization_barrier(
              jnp.take(t, ix, axis=0)).astype(jnp.float32).sum())
    # take consumed by a streaming pallas kernel — forces the same
    # materialization boundary as the real ELL pipeline
    def copy_kernel(v_ref, o_ref):
        o_ref[:] = jnp.broadcast_to(
            v_ref[:].astype(jnp.float32).sum(axis=0, keepdims=True),
            (8, H))

    TSUM = 8192
    sum_rows = pl.pallas_call(
        copy_kernel,
        grid=(S // TSUM,),
        in_specs=[pl.BlockSpec((TSUM, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S // TSUM * 8, H), jnp.float32),
    )
    timed("xla take -> pallas consumer",
          lambda t, ix: sum_rows(jnp.take(t, ix, axis=0)).sum())


if __name__ == "__main__":
    main()
