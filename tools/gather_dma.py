"""Per-row DMA gather microbench (run alone on the TPU).

Question (ROADMAP 'fuse the src gather into the kernels'): can a Pallas
kernel that issues one async DMA per gathered row — scalar-prefetched
indices, INFLIGHT-deep pipelining — beat XLA's row `take`?  If yes, the
ELL backward can read node tables directly instead of materializing the
[S, H] gathered operands in HBM (saving a full write+read round trip,
~2.8 GB/layer).  If no, the backward is take-bandwidth-bound and the
remaining step-time is a hardware floor.

Measures, in one chained jit each:
  * XLA gather-reduce (take + sum, fused — no materialization): the
    pure random-read lower bound;
  * XLA take + separate consumer (materialized, like the real pipeline);
  * the per-row DMA gather kernel (accumulates rows in VMEM).
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

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.normal(size=(N, H)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, S), jnp.int32)
    G = S // T

    def kernel(idx_ref, tbl_ref, out_ref, scratch, acc, sems):
        i = pl.program_id(0)
        base = i * T

        def dma_for(r, slot):
            return pltpu.make_async_copy(
                tbl_ref.at[idx_ref[base + r]], scratch.at[slot],
                sems.at[slot])

        for s in range(INFLIGHT):
            dma_for(s, s).start()
        acc[:] = jnp.zeros_like(acc)

        def body(c, carry):
            b = c * INFLIGHT
            for s in range(INFLIGHT):
                dma_for(b + s, s).wait()
                acc[:] = acc[:] + scratch[s][None, :].astype(jnp.float32)
                nxt = b + INFLIGHT + s

                @pl.when(nxt < T)
                def _(nxt=nxt, s=s):
                    dma_for(nxt, s).start()
            return carry

        jax.lax.fori_loop(0, T // INFLIGHT, body, 0)
        out_ref[:] = acc[:]

    gather_dma = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, H), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((INFLIGHT, H), jnp.bfloat16),
                pltpu.VMEM((1, H), jnp.float32),
                pltpu.SemaphoreType.DMA((INFLIGHT,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((G, H), jnp.float32),
    )

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

        t0 = time.time()
        float(run(tbl, idx))
        log(f"[compile] {name}: {time.time() - t0:.0f}s")
        t0 = time.time()
        float(run(tbl, idx))
        dt = (time.time() - t0) / steps
        gbs = S * H * 2 / dt / 1e9
        log(f"{name:34s} {dt * 1e3:8.2f} ms/pass  {gbs:6.0f} GB/s")

    timed("xla take+sum (fused, no writeback)",
          lambda t, ix: jnp.take(t, ix, axis=0).astype(jnp.float32).sum())
    timed("xla take -> materialized -> sum",
          lambda t, ix: jax.lax.optimization_barrier(
              jnp.take(t, ix, axis=0)).astype(jnp.float32).sum())
    # take consumed by a streaming pallas kernel — forces the same
    # materialization boundary as the real ELL pipeline
    def copy_kernel(v_ref, o_ref):
        o_ref[:] = v_ref[:].astype(jnp.float32).sum(
            axis=0, keepdims=True)

    TSUM = 8192
    sum_rows = pl.pallas_call(
        copy_kernel,
        grid=(S // TSUM,),
        in_specs=[pl.BlockSpec((TSUM, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S // TSUM, H), jnp.float32),
    )
    timed("xla take -> pallas consumer",
          lambda t, ix: sum_rows(jnp.take(t, ix, axis=0)).sum())
    timed("pallas per-row dma gather",
          lambda t, ix: gather_dma(ix, t).sum())


if __name__ == "__main__":
    main()
