"""Probe: per-row overhead vs bandwidth of XLA's row take on TPU.

Decides the backward restructure (src-major g_ek with one fused [eq||g]
2H-wide gather): if an E-row take of 2H-wide rows costs about the same as
H-wide, the wide-gather backward saves a whole E-row pass per layer.

Also times the per-edge scalar take (edge_scale gather) to decide whether
static slot-scale hoisting matters.

Run alone on the TPU: python tools/gather_probe.py
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
    S = 2_700_000  # ~ arxiv slot count
    it = 30
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, S), jnp.int32)

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
        log(f"{name:40s} {dt:8.3f} ms  (compile {comp:.1f}s)")
        return dt

    results = {}
    for htag, H, dt_ in [("H=64 bf16", 64, jnp.bfloat16),
                         ("H=128 bf16", 128, jnp.bfloat16),
                         ("H=192 bf16", 192, jnp.bfloat16),
                         ("H=256 bf16", 256, jnp.bfloat16),
                         ("H=384 bf16", 384, jnp.bfloat16),
                         ("H=128 f32", 128, jnp.float32),
                         ("H=256 f32", 256, jnp.float32)]:
        x = jnp.asarray(rng.normal(size=(N, H)), jnp.float32).astype(dt_)
        results[htag] = timeit(
            f"row take [S={S},{htag}]",
            chain(lambda x: jnp.take(x, idx, axis=0)
                  .astype(jnp.float32).sum()), x)

    # scalar take: per-edge scale gather
    xs = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    timeit("scalar take [S] f32",
           chain(lambda x: jnp.take(x, idx, axis=0).sum()), xs)

    # streaming baseline for reference
    big = jnp.asarray(rng.normal(size=(S, 128)), jnp.float32)
    timeit("stream copy+sum [S,128] f32",
           chain(lambda x: (x * 1.0000001).sum()), big)

    log("-" * 60)
    for k, v in results.items():
        log(f"{k}: {v:.2f} ms")


if __name__ == "__main__":
    main()
