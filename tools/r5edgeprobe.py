"""Bisect the fused-edge compile blowup found in the round-5 A/B
session: edge_new_step/chain compile in ~20 s at 37k padded edges but
>870 s at 2.5M. One (variant, scale) per process under `timeout`.

Variants:
  fwd        forward only (fused kernels, dual output discarded)
  grad_eq    grad wrt eq only (src pass + gwe DCE-able)
  grad_nowe  grad wrt (eq, ek) — src pass live, gwe output dead
  grad_all   grad wrt (eq, ek, w_e) — the full fused backward

Usage: timeout 420 python tools/r5edgeprobe.py --variant grad_all --edges 583000
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["fwd", "grad_eq", "grad_nowe", "grad_all"])
    ap.add_argument("--edges", type=int, default=1_166_243)
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--hidden", type=int, default=96)
    ap.add_argument("--basis-dim", type=int, default=16)
    ap.add_argument("--no-bidirect", action="store_true")
    cli = ap.parse_args()

    import jax

    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops.ell import (
        build_fast_graph,
        make_ell_sir_aggregate_pallas_fused_edge,
    )

    N, H, De = cli.nodes, cli.hidden, cli.basis_dim
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.zeros(8).sum())
    log(f"probe in {time.time() - t0:.1f}s on {jax.devices()[0]}")

    src = rng.integers(0, N, cli.edges)
    dst = rng.integers(0, N, cli.edges)
    if not cli.no_bidirect:
        src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    g = build_graph(src, dst, N, pad_multiple=1024)
    fg = build_fast_graph(g)
    log(f"graph: e_pad={g.e_pad} n_pad={g.n_pad} "
        f"dst_buckets={len(fg.dst_plan.buckets1)} "
        f"src_buckets={len(fg.src_plan.buckets1)}")

    f = make_ell_sir_aggregate_pallas_fused_edge(
        fg, jnp.tanh, "sym", edge_dtype=jnp.bfloat16, static_scale=True)
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    eb = jnp.asarray(rng.normal(size=(g.e_pad, De)), jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(De, H)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    valid = g.edge_mask.astype(jnp.float32)

    # e_basis is an EXPLICIT argument: as a closure constant it gets
    # serialized into the relay's remote-compile request and breaches
    # its body limit (HTTP 413) and/or blows the compile (ROADMAP r5)
    def loss(a, b, ebx, we):
        return jnp.sum(f(a, b, ebx, we, valid) * w)

    v = cli.variant
    if v == "fwd":
        fn = jax.jit(loss)
    elif v == "grad_eq":
        fn = jax.jit(jax.grad(loss, argnums=0))
    elif v == "grad_nowe":
        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    else:
        fn = jax.jit(jax.grad(loss, argnums=(0, 1, 3)))

    t0 = time.time()
    lowered = fn.lower(eq, ek, eb, w_e)
    t_lower = time.time() - t0
    log(f"lowered in {t_lower:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    log(f"COMPILED in {t_compile:.1f}s")
    times = []
    for _ in range(4):
        t0 = time.time()
        out = compiled(eq, ek, eb, w_e)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    med = sorted(times[1:])[1] * 1e3
    print(f'{{"variant": "{v}", "e_pad": {g.e_pad}, '
          f'"lower_s": {t_lower:.1f}, "compile_s": {t_compile:.1f}, '
          f'"dispatch_ms": {med:.1f}}}')


if __name__ == "__main__":
    main()
