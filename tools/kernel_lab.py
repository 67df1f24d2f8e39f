"""Kernel-variant lab: time alternatives of the bucket broadcast+act+
reduce kernel on the dominant arxiv bucket (B=16). Not shipped — findings
feed ops/pallas/kernels.py.

Usage: python tools/kernel_lab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    only = set(sys.argv[1:])  # e.g. v0 v2 xla bound

    def want(tag):
        return not only or tag in only

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, B, H = 111104, 16, 128   # dominant arxiv bucket, rounded to 8
    S = R * B
    it = 30
    rng = np.random.default_rng(0)
    ekg = jnp.asarray(rng.normal(size=(S, H)), jnp.bfloat16)
    eq = jnp.asarray(rng.normal(size=(R, H)), jnp.float32)
    sc = jnp.asarray(rng.random((R, B)), jnp.float32)
    sc_flat = sc.reshape(S, 1)
    act = lambda x: jax.nn.leaky_relu(x, 0.2)

    def cdiv(a, b):
        return -(-a // b)

    def timeit(name, fn, x):
        run = jax.jit(lambda x: jax.lax.fori_loop(
            0, it,
            lambda i, c: ((x * (1 + 1e-20 * c[1])).astype(x.dtype),
                          c[1] + fn(c[0]).sum().astype(jnp.float32)),
            (x, jnp.zeros(()))))
        out = run(x)
        jax.block_until_ready(out)
        _ = float(run(x)[1])  # second warmup: first timed dispatch in a
        # process can catch a multi-second tunnel stall (measured)
        t0 = time.time()
        _ = float(run(x)[1])
        dt = (time.time() - t0) / it * 1e3
        gbps = (S * H * 2 + R * H * 4) / dt * 1e3 / 1e9
        print(f"{name:44s} {dt:7.3f} ms  (~{gbps:5.0f} GB/s)", flush=True)
        return dt

    # --- variant 0: current production kernel ---------------------------
    if want("v0"):
        from sir_gcn_tpu.ops.pallas import bucket_bcast_act_reduce

        timeit("v0 production (TR from 8192 slots)",
               lambda x: bucket_bcast_act_reduce(x, eq, sc, B, act), ekg)

    # --- variant 1: scale as [S,1] lane-broadcast, flat compute ---------
    def make_v1(TRS):
        TR = TRS // B

        def kernel(ekg_ref, eq_ref, sc_ref, out_ref):
            z = (ekg_ref[:].astype(jnp.float32).reshape(TR, B, H)
                 + eq_ref[:][:, None, :])
            m = act(z).reshape(TR * B, H) * sc_ref[:]
            out_ref[:] = m.reshape(TR, B, H).sum(axis=1)

        return pl.pallas_call(
            kernel,
            grid=(cdiv(R, TR),),
            in_specs=[
                pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR * B, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, H), jnp.float32),
        )

    if want("v1"):
        for trs in (4096, 8192, 16384):
            timeit(f"v1 scale[S,1] flat, tile {trs}",
                   lambda x, t=trs: make_v1(t)(x, eq, sc_flat), ekg)

    # --- variant 2: v1 + inner fori over row chunks (small live set) ----
    def make_v2(TRS, CH):
        TR = TRS // B

        def kernel(ekg_ref, eq_ref, sc_ref, out_ref):
            def body(j, _):
                r0 = j * CH
                z = (ekg_ref[pl.ds(r0 * B, CH * B), :]
                     .astype(jnp.float32).reshape(CH, B, H)
                     + eq_ref[pl.ds(r0, CH), :][:, None, :])
                m = act(z).reshape(CH * B, H) * sc_ref[pl.ds(r0 * B, CH * B), :]
                out_ref[pl.ds(r0, CH), :] = m.reshape(CH, B, H).sum(1)
                return 0

            jax.lax.fori_loop(0, TR // CH, body, 0)

        return pl.pallas_call(
            kernel,
            grid=(cdiv(R, TR),),
            in_specs=[
                pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR * B, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, H), jnp.float32),
        )

    if want("v2"):
        for trs, ch in ((8192, 64), (16384, 64), (16384, 128)):
            timeit(f"v2 inner-loop tile {trs} chunk {ch}",
                   lambda x, t=trs, c=ch: make_v2(t, c)(x, eq, sc_flat), ekg)

    # --- variant 3: matmul-reduce: m.reshape(TR,B,H); use dot with ones?
    # (sublane reduce via strided adds) — try reduce by reshape to
    # (TR, B*H) summing strided slices
    def make_v3(TRS):
        TR = TRS // B

        def kernel(ekg_ref, eq_ref, sc_ref, out_ref):
            z = (ekg_ref[:].astype(jnp.float32).reshape(TR, B, H)
                 + eq_ref[:][:, None, :])
            m = act(z).reshape(TR * B, H) * sc_ref[:]
            acc = jnp.zeros((TR, H), jnp.float32)
            for b in range(B):
                acc = acc + m[b::B, :]
            out_ref[:] = acc

        return pl.pallas_call(
            kernel,
            grid=(cdiv(R, TR),),
            in_specs=[
                pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR * B, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, H), jnp.float32),
        )

    if want("v3"):
        timeit("v3 strided-slice reduce, tile 8192",
               lambda x: make_v3(8192)(x, eq, sc_flat), ekg)

    # --- variant 4: bf16 compute for act (accumulate f32) ----------------
    def make_v4(TRS):
        TR = TRS // B

        def kernel(ekg_ref, eq_ref, sc_ref, out_ref):
            z = (ekg_ref[:].reshape(TR, B, H)
                 + eq_ref[:][:, None, :].astype(jnp.bfloat16))
            m = (act(z).reshape(TR * B, H)
                 * sc_ref[:].astype(jnp.bfloat16))
            out_ref[:] = m.reshape(TR, B, H).astype(jnp.float32).sum(1)

        return pl.pallas_call(
            kernel,
            grid=(cdiv(R, TR),),
            in_specs=[
                pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR * B, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, H), jnp.float32),
        )

    if want("v4"):
        for trs in (8192, 16384):
            timeit(f"v4 bf16 compute, tile {trs}",
                   lambda x, t=trs: make_v4(t)(x, eq, sc_flat), ekg)

    # --- variant 5: plane-major layout [B, R, H]: reduce = B 2D adds -----
    # (the slot reorder is free host-side; gather volume unchanged)
    ekg3 = jnp.asarray(rng.normal(size=(B, R, H)), jnp.bfloat16)
    sc3 = jnp.asarray(rng.random((B, R, 1)), jnp.float32)

    def make_v5(TR):
        def kernel(ekg_ref, eq_ref, sc_ref, out_ref):
            eqb = eq_ref[:]
            acc = jnp.zeros((TR, H), jnp.float32)
            for b in range(B):
                acc = acc + (act(ekg_ref[b].astype(jnp.float32) + eqb)
                             * sc_ref[b])
            out_ref[:] = acc

        return pl.pallas_call(
            kernel,
            grid=(cdiv(R, TR),),
            in_specs=[
                pl.BlockSpec((B, TR, H), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, TR, 1), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, H), jnp.float32),
        )

    if want("v5"):
        for tr in (256, 512, 1024):
            timeit(f"v5 plane-major [B,R,H], TR {tr}",
                   lambda x, t=tr: make_v5(t)(x, eq, sc3), ekg3)

    # --- variant 6: plane-major, scale as [B, R] per-plane column --------
    def make_v6(TR):
        def kernel(ekg_ref, eq_ref, sc_ref, out_ref):
            eqb = eq_ref[:]
            acc = jnp.zeros((TR, H), jnp.float32)
            for b in range(B):
                acc = acc + (act(ekg_ref[b].astype(jnp.float32) + eqb)
                             * sc_ref[b][:, None])
            out_ref[:] = acc

        return pl.pallas_call(
            kernel,
            grid=(cdiv(R, TR),),
            in_specs=[
                pl.BlockSpec((B, TR, H), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TR, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, TR), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, H), jnp.float32),
        )

    if want("v6"):
        for tr in (512, 1024):
            timeit(f"v6 plane-major, scale [B,R], TR {tr}",
                   lambda x, t=tr: make_v6(t)(x, eq, sc3[..., 0]), ekg3)

    # --- reference: pure XLA ---------------------------------------------
    def xla_ref(x):
        z = x.astype(jnp.float32).reshape(R, B, H) + eq[:, None, :]
        return (act(z) * sc[:, :, None]).sum(1)

    if want("xla"):
        timeit("xla reference", xla_ref, ekg)

    # --- pure copy bound: how fast CAN we stream this? --------------------
    def make_copy(TRS):
        TR = TRS // B

        def kernel(ekg_ref, out_ref):
            out_ref[:] = (ekg_ref[:].astype(jnp.float32)
                          .reshape(TR, B, H).sum(1))

        return pl.pallas_call(
            kernel,
            grid=(cdiv(R, TR),),
            in_specs=[pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, H), jnp.float32),
        )

    if want("bound"):
        for trs in (8192, 16384):
            timeit(f"sum-only stream bound, tile {trs}",
                   lambda x, t=trs: make_copy(t)(x), ekg)

    # --- f32 input sum-only: is bf16->f32 conversion the cap? ------------
    def make_copy32(TRS):
        TR = TRS // B

        def kernel(ekg_ref, out_ref):
            out_ref[:] = ekg_ref[:].reshape(TR, B, H).sum(1)

        return pl.pallas_call(
            kernel,
            grid=(cdiv(R, TR),),
            in_specs=[pl.BlockSpec((TR * B, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, H), jnp.float32),
        )

    if want("bound32"):
        ekg32 = ekg.astype(jnp.float32)
        for trs in (2048, 4096):
            timeit(f"sum-only f32 input, tile {trs}",
                   lambda x, t=trs: make_copy32(t)(x), ekg32)

    # --- pure elementwise passthrough (read bf16, write bf16) -----------
    def make_pass(TRS):
        TR = TRS

        def kernel(ekg_ref, out_ref):
            out_ref[:] = ekg_ref[:] + jnp.bfloat16(1.0)

        return pl.pallas_call(
            kernel,
            grid=(cdiv(S, TR),),
            in_specs=[pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, H), jnp.bfloat16),
        )

    if want("copy"):
        for trs in (8192,):
            timeit(f"passthrough bf16 r+w, tile {trs}",
                   lambda x, t=trs: make_pass(t)(x), ekg)

    # --- pipeline-config scan for streaming ------------------------------
    def make_pass2(TR, sem):
        def kernel(ekg_ref, out_ref):
            out_ref[:] = ekg_ref[:] + jnp.bfloat16(1.0)

        return pl.pallas_call(
            kernel,
            grid=(cdiv(S, TR),),
            in_specs=[pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, H), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(sem,)) if sem else None,
        )

    if want("copy2"):
        for sem in ("parallel", "arbitrary"):
            for trs in (8192,):
                timeit(f"passthrough tile {trs} sem={sem}",
                       lambda x, t=trs, s=sem: make_pass2(t, s)(x), ekg)


if __name__ == "__main__":
    main()
