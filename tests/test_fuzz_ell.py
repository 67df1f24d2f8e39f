"""Fuzz: ELL fast path vs CSR reference across random graph shapes, degree
distributions, aggregators, activations, and masks — forward and gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import build_fast_graph, build_graph
from sir_gcn_tpu.ops import sir_aggregate

ACTS = [jnp.tanh, jax.nn.relu, lambda x: jax.nn.leaky_relu(x, 0.2),
        jax.nn.gelu]


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_ell_vs_csr(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(3, 120))
    e = int(rng.integers(1, 600))
    n_pad = int(8 * rng.integers(max(1, -(-n // 8)), 32))
    e_pad = int(8 * max(-(-e // 8), rng.integers(1, 128)))
    if n_pad < n:
        n_pad = -(-n // 8) * 8
    if e_pad < e:
        e_pad = -(-e // 8) * 8
    h = int(rng.integers(1, 24))

    # random degree skew: mix of uniform and hub-heavy
    if rng.random() < 0.5:
        dst = rng.integers(0, n, e)
    else:
        hubs = rng.integers(0, n, max(1, n // 8))
        dst = np.where(rng.random(e) < 0.6,
                       hubs[rng.integers(0, len(hubs), e)],
                       rng.integers(0, n, e))
    src = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=n_pad, e_pad=e_pad)
    fg = build_fast_graph(g, max_budget=int(2 ** rng.integers(2, 7)))

    agg = rng.choice(["sum", "mean", "sym", "max"])
    act = ACTS[rng.integers(0, len(ACTS))]
    eq = jnp.asarray(rng.normal(size=(n_pad, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(n_pad, h)), jnp.float32)
    mask = (jnp.asarray(rng.random(e_pad) < 0.7)
            if rng.random() < 0.5 else None)
    kw = {}
    if agg == "max":
        o = int(rng.integers(1, 12))
        kw["w_relation"] = jnp.asarray(rng.normal(size=(h, o)), jnp.float32)
        if rng.random() < 0.5:
            kw["b_relation"] = jnp.asarray(rng.normal(size=(o,)),
                                           jnp.float32)

    ref = sir_aggregate(g, eq, ek, act, agg, edge_mask=mask, **kw)
    got = sir_aggregate(fg, eq, ek, act, agg, edge_mask=mask, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-4, rtol=2e-3)

    w = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)

    def loss(graph):
        def inner(eq, ek):
            return jnp.sum(
                sir_aggregate(graph, eq, ek, act, agg,
                              edge_mask=mask, **kw) * w)
        return inner

    # skip gradient comparison for relu-family max (argmax ties at exactly
    # zero activations make tie-splitting vs pick-one diverge legitimately)
    if agg == "max" and act is not jnp.tanh:
        return
    ref_g = jax.grad(loss(g), argnums=(0, 1))(eq, ek)
    got_g = jax.grad(loss(fg), argnums=(0, 1))(eq, ek)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)
