"""Pallas ELL kernels vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import build_graph
from sir_gcn_tpu.ops.ell import (
    build_fast_graph,
    make_ell_sir_aggregate,
    make_ell_sir_aggregate_pallas,
)


def make_fg(rng, skew=False):
    n, e = 40, 300
    dst = (np.where(rng.random(e) < 0.5, 0, rng.integers(0, n, e))
           if skew else rng.integers(0, n, e))
    src = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=64, e_pad=512)
    return build_fast_graph(g, max_budget=16), g


@pytest.mark.parametrize("skew", [False, True])
@pytest.mark.parametrize("with_edge", [False, True])
def test_pallas_matches_xla_path(rng, skew, with_edge):
    fg, g = make_fg(rng, skew)
    H = 128  # lane-aligned
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(g.e_pad, H)), jnp.float32)
    scale = jnp.asarray(rng.random(g.e_pad), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)

    ref_f = make_ell_sir_aggregate(fg, jnp.tanh, "sum",
                                   with_edge=with_edge)
    pal_f = make_ell_sir_aggregate_pallas(fg, jnp.tanh, "sum",
                                          with_edge=with_edge,
                                          interpret=True)
    args = (eq, ek, e if with_edge else jnp.zeros((0,), jnp.float32),
            scale)
    ref = ref_f(*args)
    got = pal_f(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    # gradients
    def loss(f):
        def inner(eq, ek, e):
            return jnp.sum(f(eq, ek, e, scale) * w)
        return inner

    argn = (0, 1, 2) if with_edge else (0, 1)
    ref_g = jax.grad(loss(ref_f), argnums=argn)(*args[:3])
    got_g = jax.grad(loss(pal_f), argnums=argn)(*args[:3])
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


def test_pallas_leaky_relu_activation(rng):
    fg, g = make_fg(rng)
    H = 128
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    scale = jnp.asarray(np.asarray(g.edge_mask, np.float32))
    act = lambda x: jax.nn.leaky_relu(x, 0.2)

    ref = make_ell_sir_aggregate(fg, act, "sum")(
        eq, ek, jnp.zeros((0,)), scale)
    got = make_ell_sir_aggregate_pallas(fg, act, "sum", interpret=True)(
        eq, ek, jnp.zeros((0,)), scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
