"""Distributed ELL fast path vs the single-device CSR reference path,
on the 8-virtual-CPU-device mesh: forward, gradients, and sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sir_gcn_tpu import build_graph
from sir_gcn_tpu.ops import sir_aggregate
from sir_gcn_tpu.parallel import make_mesh
from sir_gcn_tpu.parallel.ell_distributed import (
    build_sharded_fast_graph,
    make_sharded_sir_aggregate,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@pytest.mark.parametrize("agg", ["sum", "sym", "mean"])
@pytest.mark.parametrize("skew", [False, True])
def test_sharded_matches_reference(rng, agg, skew):
    n, e, h = 256, 2048, 16
    if skew:
        dst = np.where(rng.random(e) < 0.4, 7, rng.integers(0, n, e))
    else:
        dst = rng.integers(0, n, e)
    src = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=256, e_pad=2048)
    sfg = build_sharded_fast_graph(g, 8, agg_type=agg, max_budget=16)

    eq = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)

    expected = sir_aggregate(g, eq, ek, jnp.tanh, agg)

    mesh = make_mesh((8,), ("graph",))
    f = make_sharded_sir_aggregate(sfg, jnp.tanh, mesh)
    sh = NamedSharding(mesh, P("graph"))
    eq_s, ek_s = jax.device_put(eq, sh), jax.device_put(ek, sh)

    got = f(eq_s, ek_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-4, rtol=1e-4)
    assert len(got.sharding.device_set) == 8

    # gradients (hand-written all_gather/psum_scatter transpose)
    def loss(fn):
        def inner(eq, ek):
            return jnp.sum(fn(eq, ek) * w)
        return inner

    ref_fn = lambda eq, ek: sir_aggregate(g, eq, ek, jnp.tanh, agg)
    ref_g = jax.grad(loss(ref_fn), argnums=(0, 1))(eq, ek)
    got_g = jax.jit(jax.grad(loss(f), argnums=(0, 1)))(eq_s, ek_s)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


def test_sharded_in_training_step(rng):
    """One SGD step over the sharded aggregate converges the loss."""
    n, e, h = 128, 1024, 8
    g = build_graph(rng.integers(0, n, e), rng.integers(0, n, e), n,
                    n_pad=128, e_pad=1024)
    sfg = build_sharded_fast_graph(g, 8, agg_type="sym")
    mesh = make_mesh((8,), ("graph",))
    f = make_sharded_sir_aggregate(sfg, jnp.tanh, mesh)
    sh = NamedSharding(mesh, P("graph"))
    rep = NamedSharding(mesh, P())

    x = jax.device_put(
        jnp.asarray(rng.normal(size=(128, h)), jnp.float32), sh)
    y = jax.device_put(
        jnp.asarray(rng.normal(size=(128, h)), jnp.float32), sh)
    wq = jax.device_put(
        jnp.asarray(rng.normal(size=(h, h)) * 0.3, jnp.float32), rep)
    wk = jax.device_put(
        jnp.asarray(rng.normal(size=(h, h)) * 0.3, jnp.float32), rep)

    @jax.jit
    def loss(wq, wk):
        return jnp.mean((f(x @ wq, x @ wk) - y) ** 2)

    l0 = float(loss(wq, wk))
    for _ in range(20):
        gq, gk = jax.jit(jax.grad(loss, argnums=(0, 1)))(wq, wk)
        wq = wq - 0.1 * gq
        wk = wk - 0.1 * gk
    l1 = float(loss(wq, wk))
    assert l1 < l0


@pytest.mark.parametrize("agg", ["sum", "sym", "mean"])
def test_sharded_pallas_matches_reference(rng, agg):
    """Fused-kernel sharded variant (Pallas local compute, interpret mode
    on CPU): forward + hand-written backward vs the CSR reference."""
    from sir_gcn_tpu.parallel.ell_distributed import (
        make_sharded_sir_aggregate_pallas,
    )

    n, e, h = 256, 2048, 128
    dst = np.where(rng.random(e) < 0.4, 7, rng.integers(0, n, e))
    src = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=256, e_pad=2048)
    sfg = build_sharded_fast_graph(g, 8, agg_type=agg, max_budget=16)

    eq = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)

    expected = sir_aggregate(g, eq, ek, jnp.tanh, agg)

    mesh = make_mesh((8,), ("graph",))
    f = make_sharded_sir_aggregate_pallas(sfg, jnp.tanh, mesh,
                                          interpret=True)
    sh = NamedSharding(mesh, P("graph"))
    eq_s, ek_s = jax.device_put(eq, sh), jax.device_put(ek, sh)

    got = f(eq_s, ek_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-4, rtol=1e-4)
    assert len(got.sharding.device_set) == 8

    def loss(fn):
        def inner(eq, ek):
            return jnp.sum(fn(eq, ek) * w)
        return inner

    ref_fn = lambda eq, ek: sir_aggregate(g, eq, ek, jnp.tanh, agg)
    ref_g = jax.grad(loss(ref_fn), argnums=(0, 1))(eq, ek)
    got_g = jax.jit(jax.grad(loss(f), argnums=(0, 1)))(eq_s, ek_s)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)
