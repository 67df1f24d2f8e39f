"""Boundary-only halo exchange (all_to_all) vs the single-device CSR
reference path, on the 8-virtual-CPU-device mesh: forward, gradients,
dynamic DropEdge scales, and a training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sir_gcn_tpu import build_graph
from sir_gcn_tpu.ops import sir_aggregate
from sir_gcn_tpu.parallel import make_mesh
from sir_gcn_tpu.parallel.halo import (
    build_halo_fast_graph,
    make_halo_counts,
    make_halo_sir_aggregate,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _locality_graph(rng, n, e, frac_local=0.6, n_local=32):
    """Graph where most edges stay within a shard's node range — the
    regime the halo path is built for (boundary << full halo)."""
    dst = rng.integers(0, n, e)
    local = rng.random(e) < frac_local
    base = (dst // n_local) * n_local
    src = np.where(local, base + rng.integers(0, n_local, e),
                   rng.integers(0, n, e))
    return src.astype(np.int64), dst.astype(np.int64)


@pytest.mark.parametrize("agg", ["sum", "sym", "mean"])
@pytest.mark.parametrize("skew", [False, True])
def test_halo_matches_reference(rng, agg, skew):
    n, e, h = 256, 2048, 16
    if skew:
        src = rng.integers(0, n, e)
        dst = np.where(rng.random(e) < 0.4, 7, rng.integers(0, n, e))
    else:
        src, dst = _locality_graph(rng, n, e)
    g = build_graph(src, dst, n, n_pad=256, e_pad=2048)
    hfg = build_halo_fast_graph(g, 8, agg_type=agg, max_budget=16)

    eq = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)

    expected = sir_aggregate(g, eq, ek, jnp.tanh, agg)

    mesh = make_mesh((8,), ("graph",))
    f = make_halo_sir_aggregate(hfg, jnp.tanh, mesh)
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


def test_halo_table_smaller_than_allgather(rng):
    """On a locality-heavy graph the halo table is much smaller than the
    full node set the all_gather path would move."""
    n = 512
    src, dst = _locality_graph(rng, n, 4096, frac_local=0.9, n_local=64)
    g = build_graph(src, dst, n, n_pad=512, e_pad=4096)
    hfg = build_halo_fast_graph(g, 8, agg_type="sum")
    assert hfg.h_max * hfg.n_shards < n // 2


@pytest.mark.parametrize("agg", ["sum", "sym", "mean"])
def test_halo_dynamic_edge_scale(rng, agg):
    """DropEdge on the distributed path: dynamic [E_pad] scale matches the
    single-device fast-path semantics (mask x sym norms; mean divides by
    dynamic counts)."""
    n, e, h = 256, 2048, 8
    src, dst = _locality_graph(rng, n, e)
    g = build_graph(src, dst, n, n_pad=256, e_pad=2048)
    hfg = build_halo_fast_graph(g, 8, agg_type=agg, max_budget=16)

    eq = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    keep = jnp.asarray(rng.random(2048) < 0.7)

    expected = sir_aggregate(g, eq, ek, jnp.tanh, agg, edge_mask=keep)

    # replicate the single-device scale computation (message_passing)
    valid = jnp.logical_and(g.edge_mask, keep)
    scale = valid.astype(jnp.float32)
    if agg == "sym":
        in_n = jnp.power(jnp.maximum(g.in_deg, 1.0), -0.5)
        out_n = jnp.power(jnp.maximum(g.out_deg, 1.0), -0.5)
        scale = scale * jnp.take(out_n, g.src) * jnp.take(in_n, g.dst)

    mesh = make_mesh((8,), ("graph",))
    f = make_halo_sir_aggregate(hfg, jnp.tanh, mesh, dynamic_scale=True)
    sh = NamedSharding(mesh, P("graph"))
    eq_s, ek_s = jax.device_put(eq, sh), jax.device_put(ek, sh)

    out = f(eq_s, ek_s, scale)
    if agg == "mean":
        counts = make_halo_counts(hfg, mesh)(valid.astype(jnp.float32))
        out = out / jnp.maximum(counts, 1.0)[:, None]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-4, rtol=1e-4)

    # gradients through the dynamic-scale path
    w = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    if agg != "mean":
        ref_g = jax.grad(
            lambda a, b: jnp.sum(
                sir_aggregate(g, a, b, jnp.tanh, agg, edge_mask=keep) * w),
            argnums=(0, 1))(eq, ek)
        got_g = jax.jit(jax.grad(
            lambda a, b: jnp.sum(f(a, b, scale) * w),
            argnums=(0, 1)))(eq_s, ek_s)
        for x, y in zip(got_g, ref_g):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=3e-4, rtol=1e-3)


def test_halo_in_training_step(rng):
    n, e, h = 128, 1024, 8
    src, dst = _locality_graph(rng, n, e, n_local=16)
    g = build_graph(src, dst, n, n_pad=128, e_pad=1024)
    hfg = build_halo_fast_graph(g, 8, agg_type="sym")
    mesh = make_mesh((8,), ("graph",))
    f = make_halo_sir_aggregate(hfg, jnp.tanh, mesh)
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

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    l0 = float(loss(wq, wk))
    for _ in range(20):
        gq, gk = grad(wq, wk)
        wq = wq - 0.1 * gq
        wk = wk - 0.1 * gk
    assert float(loss(wq, wk)) < l0


@pytest.mark.parametrize("agg", ["sum", "sym", "mean"])
@pytest.mark.parametrize("dynamic", [False, True])
def test_halo_pallas_matches_reference(rng, agg, dynamic):
    """Fused-kernel halo variant (Pallas local compute, interpret mode):
    forward + hand-written backward vs the CSR reference, with static and
    dynamic (DropEdge-style) scales."""
    from sir_gcn_tpu.parallel.halo import make_halo_sir_aggregate_pallas

    n, e, h = 256, 2048, 128
    src, dst = _locality_graph(rng, n, e)
    g = build_graph(src, dst, n, n_pad=256, e_pad=2048)
    hfg = build_halo_fast_graph(g, 8, agg_type=agg, max_budget=16)

    eq = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)

    mesh = make_mesh((8,), ("graph",))
    sh = NamedSharding(mesh, P("graph"))
    eq_s, ek_s = jax.device_put(eq, sh), jax.device_put(ek, sh)

    if dynamic:
        # emulate DropEdge: the dynamic scale REPLACES the static one
        emask = jnp.asarray(
            (rng.random(g.e_pad) < 0.7) & np.asarray(g.edge_mask))
        from sir_gcn_tpu.ops.ell import static_edge_scale

        scale = jnp.asarray(static_edge_scale(
            agg, g.src, g.dst, np.asarray(emask), g.in_deg, g.out_deg
        ).astype(np.float32))
        f = make_halo_sir_aggregate_pallas(hfg, jnp.tanh, mesh,
                                           dynamic_scale=True,
                                           interpret=True)
        f_ref = make_halo_sir_aggregate(hfg, jnp.tanh, mesh,
                                        dynamic_scale=True,
                                        use_pallas=False)
        got = f(eq_s, ek_s, scale)
        expected = f_ref(eq_s, ek_s, scale)
        args = (eq_s, ek_s, scale)
        argn = (0, 1)

        def loss(fn):
            def inner(eq, ek):
                return jnp.sum(fn(eq, ek, scale) * w)
            return inner
    else:
        f = make_halo_sir_aggregate_pallas(hfg, jnp.tanh, mesh,
                                           interpret=True)
        expected = sir_aggregate(g, eq, ek, jnp.tanh, agg)
        got = f(eq_s, ek_s)

        def loss(fn):
            def inner(eq, ek):
                return jnp.sum(fn(eq, ek) * w)
            return inner

        f_ref = lambda eq, ek: sir_aggregate(g, eq, ek, jnp.tanh, agg)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-4, rtol=1e-4)
    ref_g = jax.grad(loss(f_ref), argnums=(0, 1))(
        *( (eq_s, ek_s) if dynamic else (eq, ek) ))
    got_g = jax.jit(jax.grad(loss(f), argnums=(0, 1)))(eq_s, ek_s)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("agg", ["sum", "sym", "mean"])
@pytest.mark.parametrize("dynamic", [False, True])
def test_halo_edge_features_matches_reference(rng, agg, dynamic):
    """SIREConv on the halo path (reference models/conv.py:111: edge term
    inside sigma): forward + grads wrt eq/ek/e vs the single-device CSR
    reference, static and DropEdge-dynamic scales, via the HaloGraph
    dispatch."""
    from sir_gcn_tpu.parallel.halo import build_halo_graph

    n, e, h = 256, 2048, 8
    src, dst = _locality_graph(rng, n, e)
    g = build_graph(src, dst, n, n_pad=256, e_pad=2048)
    mesh = make_mesh((8,), ("graph",))
    hg = build_halo_graph(g, 8, mesh, agg_type=agg, max_budget=16)

    eq = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ef = jnp.asarray(rng.normal(size=(2048, h)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    keep = (jnp.asarray(rng.random(2048) < 0.7) if dynamic else None)

    expected = sir_aggregate(g, eq, ek, jnp.tanh, agg, e=ef,
                             edge_mask=keep)
    sh = NamedSharding(mesh, P("graph"))
    eq_s, ek_s = jax.device_put(eq, sh), jax.device_put(ek, sh)
    got = sir_aggregate(hg, eq_s, ek_s, jnp.tanh, agg, e=ef,
                        edge_mask=keep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-4, rtol=1e-4)

    def loss(graph):
        def inner(a, b, c):
            return jnp.sum(sir_aggregate(graph, a, b, jnp.tanh, agg,
                                         e=c, edge_mask=keep) * w)
        return inner

    ref_g = jax.grad(loss(g), argnums=(0, 1, 2))(eq, ek, ef)
    got_g = jax.jit(jax.grad(loss(hg), argnums=(0, 1, 2)))(eq_s, ek_s, ef)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("with_edge", [False, True])
@pytest.mark.parametrize("dynamic", [False, True])
def test_halo_max_matches_reference(rng, with_edge, dynamic):
    """max aggregation on the halo path (reference models/conv.py:47:
    per-edge W_R before the reduce): forward + grads wrt eq/ek/e/W_R/b
    vs the single-device reference, incl. empty-node zero fill."""
    from sir_gcn_tpu.parallel.halo import build_halo_graph

    n, e, h, o = 256, 2048, 8, 6
    src, dst = _locality_graph(rng, n, e)
    # leave some nodes with no in-edges to exercise the zero fill
    dst = np.where(dst % 16 == 3, (dst + 1) % n, dst)
    g = build_graph(src, dst, n, n_pad=256, e_pad=2048)
    mesh = make_mesh((8,), ("graph",))
    hg = build_halo_graph(g, 8, mesh, agg_type="max", max_budget=16)

    eq = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ef = (jnp.asarray(rng.normal(size=(2048, h)), jnp.float32)
          if with_edge else None)
    wr = jnp.asarray(rng.normal(size=(h, o)), jnp.float32)
    br = jnp.asarray(rng.normal(size=(o,)), jnp.float32)
    wloss = jnp.asarray(rng.normal(size=(256, o)), jnp.float32)
    keep = (jnp.asarray(rng.random(2048) < 0.7) if dynamic else None)

    expected = sir_aggregate(g, eq, ek, jnp.tanh, "max", e=ef,
                             w_relation=wr, b_relation=br,
                             edge_mask=keep)
    sh = NamedSharding(mesh, P("graph"))
    eq_s, ek_s = jax.device_put(eq, sh), jax.device_put(ek, sh)
    got = sir_aggregate(hg, eq_s, ek_s, jnp.tanh, "max", e=ef,
                        w_relation=wr, b_relation=br, edge_mask=keep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-4, rtol=1e-4)

    def loss(graph):
        def inner(a, b, c, wr_, br_):
            return jnp.sum(sir_aggregate(
                graph, a, b, jnp.tanh, "max",
                e=(c if with_edge else None), w_relation=wr_,
                b_relation=br_, edge_mask=keep) * wloss)
        return inner

    ef_in = ef if with_edge else jnp.zeros((2048, h), jnp.float32)
    ref_g = jax.grad(loss(g), argnums=(0, 1, 2, 3, 4))(
        eq, ek, ef_in, wr, br)
    got_g = jax.jit(jax.grad(loss(hg), argnums=(0, 1, 2, 3, 4)))(
        eq_s, ek_s, ef_in, wr, br)
    for i, (a, b) in enumerate(zip(got_g, ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3,
                                   err_msg=f"grad argnum {i}")


def test_halo_chunked_edge_cotangent_identical(rng):
    """The chunked halo edge-cotangent unslice (`_unshard_edge_grad`,
    engaged automatically above 1M padded edges) is numerically identical
    to the single-take form."""
    import sir_gcn_tpu.ops.ell as ell_mod
    from sir_gcn_tpu.parallel.halo import build_halo_graph

    n, e, h = 256, 2048, 8
    src, dst = _locality_graph(rng, n, e)
    g = build_graph(src, dst, n, n_pad=256, e_pad=2048)
    mesh = make_mesh((8,), ("graph",))
    hg = build_halo_graph(g, 8, mesh, agg_type="sum", max_budget=16)

    eq = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    ef = jnp.asarray(rng.normal(size=(2048, h)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, h)), jnp.float32)
    sh = NamedSharding(mesh, P("graph"))
    eq_s, ek_s = jax.device_put(eq, sh), jax.device_put(ek, sh)

    def loss(a, b, c):
        return jnp.sum(sir_aggregate(hg, a, b, jnp.tanh, "sum", e=c) * w)

    try:
        ell_mod.set_edge_cotangent_chunks(1)
        base = jax.grad(loss, argnums=(0, 1, 2))(eq_s, ek_s, ef)
        ell_mod.set_edge_cotangent_chunks(4)
        chunked = jax.grad(loss, argnums=(0, 1, 2))(eq_s, ek_s, ef)
    finally:
        ell_mod.set_edge_cotangent_chunks(0)
    for a, b in zip(chunked, base):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
