"""Per-chip quality of the distributed ELL path: 1-shard sharded
aggregate (XLA and Pallas local compute) vs the single-device Pallas fast
path, fwd+bwd at arxiv scale. Run alone on the TPU.

The sharded path's 1-shard time bounds achievable multi-chip efficiency:
scaling efficiency = t_single / (t_shard1 + comms), so t_shard1 close to
t_single means the local compute is not the bottleneck.
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
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, ".")
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops import set_edge_dtype
    from sir_gcn_tpu.ops.ell import build_fast_graph, ell_sir_aggregate
    from sir_gcn_tpu.parallel import make_mesh
    from sir_gcn_tpu.parallel.ell_distributed import (
        build_sharded_fast_graph,
        make_sharded_sir_aggregate,
        make_sharded_sir_aggregate_pallas,
    )

    N, E_RAW, H = 169_343, 1_166_243, 96
    it = 20
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E_RAW)
    dst = rng.integers(0, N, E_RAW)
    src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    g = build_graph(src, dst, N, pad_multiple=1024)
    set_edge_dtype(jnp.bfloat16)

    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)

    def timed(name, fn):
        @jax.jit
        def run(eq, ek):
            def body(i, carry):
                eq, acc = carry
                out = jax.grad(
                    lambda eq, ek: jnp.sum(fn(eq, ek) * w),
                    argnums=0)(eq, ek)
                return (eq * (1.0 + 1e-20 * out[0, 0]), acc + out[0, 0])
            return jax.lax.fori_loop(0, it, body, (eq, jnp.zeros(())))

        _, a = run(eq, ek)
        float(a)
        t0 = time.time()
        _, a = run(eq, ek)
        float(a)
        dt = (time.time() - t0) / it * 1e3
        log(f"{name:36s} {dt:8.2f} ms/iter (fwd+bwd agg)")
        return dt

    log("building single-device fast graph ...")
    fg = build_fast_graph(g)
    timed("single-device Pallas fast path",
          lambda eq, ek: ell_sir_aggregate(fg, eq, ek, jnp.tanh, "sym",
                                           static_scale=True))

    log("building 1-shard sharded graph ...")
    sfg = build_sharded_fast_graph(g, 1, agg_type="sym")
    mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
    sh = NamedSharding(mesh, P("graph"))
    eq, ek, w = (jax.device_put(x, sh) for x in (eq, ek, w))

    f_x = make_sharded_sir_aggregate(sfg, jnp.tanh, mesh, use_pallas=False)
    timed("sharded (XLA local compute) @1", f_x)
    f_p = make_sharded_sir_aggregate_pallas(sfg, jnp.tanh, mesh)
    timed("sharded (Pallas local compute) @1", f_p)


if __name__ == "__main__":
    main()
