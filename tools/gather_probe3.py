"""Probe 3: is the random row `take` BYTE-bound or ROW-bound?

gather_dma.py measured 2.75M bf16[...,128] takes (256 B rows) at
~9.3 ms (76 GB/s useful) and the lane-concat fused-take experiment
(ROADMAP) was neutral — consistent with EITHER a ~75 GB/s byte bound
(512 B rows take 2x a 256 B row) OR a row bound with per-row cost
linear in row bytes above 256 B. The two hypotheses give opposite
predictions for sub-256 B rows and for dtype shrinking (fp8 pipeline):
byte-bound => halving row bytes halves take time; row-bound => no win.

Run alone on the TPU: python tools/gather_probe3.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    N = 169_984
    S = 2_752_512
    it = 10
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, S).astype(np.int32))

    t0 = time.time()
    float(jnp.sum(idx[:8].astype(jnp.float32)))
    log(f"probe in {time.time() - t0:.1f}s")

    def timed(name, tbl, row_bytes):
        @jax.jit
        def run(t, ix):
            def body(i, carry):
                tt, s = carry
                ixx = jnp.maximum(ix, i - jnp.int32(2_000_000_000))
                out = jax.lax.optimization_barrier(
                    jnp.take(tt, ixx, axis=0)).astype(jnp.float32).sum()
                return (tt, s + out)
            _, s = jax.lax.fori_loop(0, it, body,
                                     (t, jnp.zeros((), jnp.float32)))
            return s

        float(run(tbl, idx))
        t0 = time.time()
        float(run(tbl, idx))
        dt = (time.time() - t0) / it
        gbs = S * row_bytes / dt / 1e9
        ns = dt / S * 1e9
        log(f"{name:28s} {dt * 1e3:8.2f} ms  {gbs:6.1f} GB/s useful"
            f"  {ns:5.2f} ns/row")

    for h, dt_, tag in ((32, jnp.bfloat16, "bf16"),
                        (64, jnp.bfloat16, "bf16"),
                        (128, jnp.bfloat16, "bf16"),
                        (256, jnp.bfloat16, "bf16"),
                        (128, jnp.float32, "f32"),
                        (128, jnp.int8, "int8")):
        bytes_per = h * {jnp.bfloat16: 2, jnp.float32: 4,
                         jnp.int8: 1}[dt_]
        tbl = jnp.asarray(
            (rng.normal(size=(N, h)) * 10).astype(np.float32)).astype(dt_)
        timed(f"take {tag}[N,{h}] ({bytes_per}B)", tbl, bytes_per)

    # streaming reference: sequential read of the same total bytes
    big = jnp.asarray(rng.normal(size=(S // 2, 128)).astype(np.float32),
                      jnp.bfloat16)

    @jax.jit
    def stream(t):
        def body(i, s):
            return s + (t * (1.0 + 1e-20 * s)).astype(
                jnp.float32).sum()
        return jax.lax.fori_loop(0, it, body, jnp.zeros((), jnp.float32))

    float(stream(big))
    t0 = time.time()
    float(stream(big))
    dt = (time.time() - t0) / it
    log(f"{'stream bf16 read (same GB)':28s} {dt * 1e3:8.2f} ms  "
        f"{big.size * 2 / dt / 1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
