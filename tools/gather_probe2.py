"""Probe 2: row-take cost matrix (table rows x H x dtype) + kernel H
sensitivity. Decides the lane-pad-to-128 fast-path change.

Run alone on the TPU: python tools/gather_probe2.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    N = 169_343
    S = 2_700_000
    it = 30
    rng = np.random.default_rng(0)
    idxN = jnp.asarray(rng.integers(0, N, S), jnp.int32)
    idxS = jnp.asarray(rng.integers(0, S, S), jnp.int32)

    def chain(body):
        @jax.jit
        def run(x):
            def step(i, carry):
                x, acc = carry
                out = body(x)
                return ((x * (1.0 + 1e-20 * out)).astype(x.dtype),
                        acc + out.astype(jnp.float32))
            return jax.lax.fori_loop(0, it, step, (x, jnp.zeros(())))
        return run

    def timeit(name, fn, x0):
        t0 = time.time()
        out = fn(x0)
        jax.block_until_ready(out)
        comp = time.time() - t0
        out = fn(x0)
        _ = float(out[1])
        t0 = time.time()
        out = fn(x0)
        _ = float(out[1])
        dt = (time.time() - t0) / it * 1e3
        log(f"{name:46s} {dt:8.3f} ms  (compile {comp:.1f}s)")
        return dt

    # --- take matrix ---------------------------------------------------
    for rows, idx, tag in [(N, idxN, "N"), (S, idxS, "S")]:
        for H in (96, 128):
            x = jnp.asarray(rng.normal(size=(rows, H)),
                            jnp.float32).astype(jnp.bfloat16)
            timeit(f"take [{tag},{H}] bf16",
                   chain(lambda x: jnp.take(x, idx, axis=0)
                         .astype(jnp.float32).sum()), x)

    # --- fwd kernel H sensitivity (single dominant bucket B=16) --------
    from sir_gcn_tpu.ops.pallas import (
        bucket_bcast_act_reduce,
        bucket_bcast_act_reduce_bwd,
    )

    act = lambda x: jax.nn.leaky_relu(x, 0.2)
    B = 16
    R = S // B
    for H in (96, 128):
        ekg = (jnp.asarray(rng.normal(size=(R * B, H)), jnp.float32)
               .astype(jnp.bfloat16))
        eq_rows = jnp.asarray(rng.normal(size=(R, H)), jnp.float32)
        sc = jnp.ones((R, B), jnp.float32)
        timeit(f"fwd kernel B=16 H={H} (varying ekg)",
               chain(lambda x: bucket_bcast_act_reduce(
                   x, eq_rows, sc, B, act).sum()), ekg)
        g = jnp.asarray(rng.normal(size=(R, H)), jnp.float32)

        def bwd(gg, ekg=ekg, eq_rows=eq_rows, sc=sc):
            gz, geq = bucket_bcast_act_reduce_bwd(
                ekg, eq_rows, sc, gg, B, act, gz_dtype=jnp.bfloat16)
            return gz.astype(jnp.float32).sum() + geq.sum()

        timeit(f"bwd kernel B=16 H={H} (varying g)", chain(bwd), g)


if __name__ == "__main__":
    main()
