"""ELL fast-path correctness: the scatter-free pipeline must match the CSR
reference path exactly (forward and gradients), including hub splitting,
dynamic edge masks, and all linear aggregators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import build_graph
from sir_gcn_tpu.ops import sir_aggregate
from sir_gcn_tpu.ops.ell import build_fast_graph, build_reduce_plan


def make_graph(rng, n=40, e=300, n_pad=64, e_pad=512, skew=False):
    if skew:
        # hub node 0 receives most edges => exercises chunk splitting
        dst = np.where(rng.random(e) < 0.5, 0, rng.integers(0, n, e))
    else:
        dst = rng.integers(0, n, e)
    src = rng.integers(0, n, e)
    return build_graph(src, dst, n, n_pad=n_pad, e_pad=e_pad), src, dst


def test_reduce_plan_matches_segment_sum(rng):
    g, src, dst = make_graph(rng)
    plan = build_reduce_plan(np.asarray(g.dst), np.asarray(g.edge_mask),
                             g.n_pad, max_budget=8)
    vals = rng.normal(size=(g.e_pad, 5)).astype(np.float32)
    slot_vals = (plan.gather_edges(jnp.asarray(vals))
                 * plan.slot_valid[:, None])
    got = plan.reduce_slots_sum(slot_vals)
    expected = np.zeros((g.n_pad, 5), np.float32)
    sd = np.asarray(g.dst)[np.asarray(g.edge_mask)]
    for i, d in enumerate(sd):
        expected[d] += vals[np.asarray(g.edge_mask)][i]
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_reduce_plan_hub_splitting(rng):
    g, src, dst = make_graph(rng, skew=True)
    plan = build_reduce_plan(np.asarray(g.dst), np.asarray(g.edge_mask),
                             g.n_pad, max_budget=8)
    assert plan.s2_gather is not None  # hub forced a second stage
    vals = rng.normal(size=(g.e_pad, 3)).astype(np.float32)
    slot_vals = (plan.gather_edges(jnp.asarray(vals))
                 * plan.slot_valid[:, None])
    got = plan.reduce_slots_sum(slot_vals)
    expected = np.zeros((g.n_pad, 3), np.float32)
    em = np.asarray(g.edge_mask)
    for i in np.nonzero(em)[0]:
        expected[np.asarray(g.dst)[i]] += vals[i]
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_spread_is_transpose_of_reduce(rng):
    g, *_ = make_graph(rng)
    plan = build_reduce_plan(np.asarray(g.dst), np.asarray(g.edge_mask),
                             g.n_pad, max_budget=16)
    # <reduce(x), y> == <x, spread(y)> for masked x
    x = jnp.asarray(rng.normal(size=(plan.num_slots, 4)), jnp.float32)
    x = x * plan.slot_valid[:, None]
    y = jnp.asarray(rng.normal(size=(g.n_pad, 4)), jnp.float32)
    lhs = jnp.sum(plan.reduce_slots_sum(x) * y)
    rhs = jnp.sum(x * plan.spread(y) * plan.slot_valid[:, None])
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


@pytest.mark.parametrize("agg", ["sum", "mean", "sym"])
@pytest.mark.parametrize("skew", [False, True])
def test_fast_graph_matches_reference(rng, agg, skew):
    g, src, dst = make_graph(rng, skew=skew)
    fg = build_fast_graph(g, max_budget=16)
    eq = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)

    ref = sir_aggregate(g, eq, ek, jnp.tanh, agg)
    got = sir_aggregate(fg, eq, ek, jnp.tanh, agg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("agg", ["sum", "sym"])
def test_fast_graph_gradients_match(rng, agg):
    g, *_ = make_graph(rng, skew=True)
    fg = build_fast_graph(g, max_budget=16)
    eq = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)

    def loss(graph):
        def inner(eq, ek):
            out = sir_aggregate(graph, eq, ek, jnp.tanh, agg)
            return jnp.sum(out * w)
        return inner

    ref_g = jax.grad(loss(g), argnums=(0, 1))(eq, ek)
    got_g = jax.grad(loss(fg), argnums=(0, 1))(eq, ek)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


def test_fast_graph_edge_features_and_grad(rng):
    g, *_ = make_graph(rng)
    fg = build_fast_graph(g, max_budget=16)
    eq = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(g.e_pad, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)

    def loss(graph):
        def inner(eq, ek, e):
            out = sir_aggregate(graph, eq, ek, jnp.tanh, "sum", e=e)
            return jnp.sum(out * w)
        return inner

    ref = loss(g)(eq, ek, e)
    got = loss(fg)(eq, ek, e)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)

    ref_g = jax.grad(loss(g), argnums=(0, 1, 2))(eq, ek, e)
    got_g = jax.grad(loss(fg), argnums=(0, 1, 2))(eq, ek, e)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


def test_fast_graph_edge_mask(rng):
    g, *_ = make_graph(rng)
    fg = build_fast_graph(g, max_budget=16)
    eq = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    mask = jnp.asarray(rng.random(g.e_pad) < 0.5)

    for agg in ["sum", "mean"]:
        ref = sir_aggregate(g, eq, ek, jnp.tanh, agg, edge_mask=mask)
        got = sir_aggregate(fg, eq, ek, jnp.tanh, agg, edge_mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("skew", [False, True])
def test_fast_graph_max_matches_reference(rng, skew):
    g, *_ = make_graph(rng, skew=skew)
    fg = build_fast_graph(g, max_budget=16)
    eq = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    wr = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    br = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    ref = sir_aggregate(g, eq, ek, jnp.tanh, "max", w_relation=wr,
                        b_relation=br)
    got = sir_aggregate(fg, eq, ek, jnp.tanh, "max", w_relation=wr,
                        b_relation=br)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fast_graph_max_gradients(rng):
    g, *_ = make_graph(rng)
    fg = build_fast_graph(g, max_budget=16)
    eq = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    wr = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    br = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    wout = jnp.asarray(rng.normal(size=(g.n_pad, 4)), jnp.float32)

    def loss(graph):
        def inner(eq, ek, wr, br):
            out = sir_aggregate(graph, eq, ek, jnp.tanh, "max",
                                w_relation=wr, b_relation=br)
            return jnp.sum(out * wout)
        return inner

    ref_g = jax.grad(loss(g), argnums=(0, 1, 2, 3))(eq, ek, wr, br)
    got_g = jax.grad(loss(fg), argnums=(0, 1, 2, 3))(eq, ek, wr, br)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


def test_sirconv_on_fast_graph(rng):
    from sir_gcn_tpu.models import SIRConv

    g, *_ = make_graph(rng)
    fg = build_fast_graph(g)
    feat = jnp.asarray(rng.normal(size=(g.n_pad, 6)), jnp.float32)
    conv = SIRConv(hidden_dim=8, output_dim=5, activation=jnp.tanh,
                   agg_type="sym")
    params = conv.init(jax.random.PRNGKey(0), g, feat)
    ref = conv.apply(params, g, feat)
    got = conv.apply(params, fg, feat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_remat_grads_identical(rng, use_pallas):
    """Activation checkpointing (save node inputs, recompute slots in
    backward) matches the store-residuals path bitwise in fwd and grads."""
    import jax

    from sir_gcn_tpu.ops.ell import (
        make_ell_sir_aggregate,
        make_ell_sir_aggregate_pallas,
    )

    n, e, h = 64, 400, 8
    g = build_graph(rng.integers(0, n, e), rng.integers(0, n, e), n,
                    n_pad=64, e_pad=512)
    fg = build_fast_graph(g)
    eq = jnp.asarray(rng.normal(size=(64, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(64, h)), jnp.float32)
    ev = jnp.asarray(rng.normal(size=(512, h)), jnp.float32)
    scale = fg.edge_mask.astype(jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, h)), jnp.float32)

    def make(remat):
        if use_pallas:
            return make_ell_sir_aggregate_pallas(
                fg, jnp.tanh, "sum", with_edge=True, interpret=True,
                remat=remat)
        return make_ell_sir_aggregate(fg, jnp.tanh, "sum",
                                      with_edge=True, remat=remat)

    def loss(f):
        return lambda eq, ek, ev: jnp.sum(f(eq, ek, ev, scale) * w)

    f0, f1 = make(False), make(True)
    out0 = f0(eq, ek, ev, scale)
    out1 = f1(eq, ek, ev, scale)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
    g0 = jax.grad(loss(f0), argnums=(0, 1, 2))(eq, ek, ev)
    g1 = jax.grad(loss(f1), argnums=(0, 1, 2))(eq, ek, ev)
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adversarial_activation_override_and_routing(rng):
    """The elementwise probe is a heuristic (ops/ell.py docstring): an
    activation that is diagonal at the probe points but row-coupled
    elsewhere would be misrouted onto the factorized backward. The
    documented escape hatch ``act.sir_elementwise = False`` must be
    respected, and the general path it selects must produce exact grads
    for the row-coupled activation."""
    from sir_gcn_tpu.ops.ell import (
        activation_is_elementwise,
        make_ell_sir_aggregate_pallas,
    )

    def sneaky(z):
        # row-coupled only where row mean > 100 — never at probe points
        coupled = z + jnp.mean(z, axis=-1, keepdims=True)
        gate = jnp.mean(z, axis=-1, keepdims=True) > 100.0
        return jnp.where(gate, coupled, jnp.tanh(z))

    # without the override the 3-point probe is (by construction) fooled
    assert activation_is_elementwise(sneaky, 8) is True

    def sneaky2(z):
        coupled = z + jnp.mean(z, axis=-1, keepdims=True)
        gate = jnp.mean(z, axis=-1, keepdims=True) > 100.0
        return jnp.where(gate, coupled, jnp.tanh(z))

    sneaky2.sir_elementwise = False
    assert activation_is_elementwise(sneaky2, 8) is False

    # the general path computes exact grads for it (vs the CSR reference)
    g, *_ = make_graph(rng)
    fg = build_fast_graph(g, max_budget=16)
    eq = jnp.asarray(rng.normal(size=(64, 8)) * 60.0, jnp.float32)
    ek = jnp.asarray(rng.normal(size=(64, 8)) * 60.0, jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    f = make_ell_sir_aggregate_pallas(fg, sneaky2, "sum",
                                      interpret=True,
                                      act_elementwise=False)
    es = fg.edge_mask.astype(jnp.float32)
    e0 = jnp.zeros((0,), jnp.float32)

    def loss_fast(a, b):
        return jnp.sum(f(a, b, e0, es) * w)

    def loss_ref(a, b):
        return jnp.sum(sir_aggregate(g, a, b, sneaky2, "sum") * w)

    got = jax.grad(loss_fast, argnums=(0, 1))(eq, ek)
    exp = jax.grad(loss_ref, argnums=(0, 1))(eq, ek)
    for x, y in zip(got, exp):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-3, rtol=2e-3)


def test_plan_inflation_and_correctness_powerlaw(rng):
    """Heavy-tail in-degree graph (the real ogbn-arxiv shape, VERDICT r2
    item 2): the hub-split/budget machinery must keep slot inflation
    bounded (<1.3x) and stay exact vs the CSR reference."""
    from sir_gcn_tpu.data.synthetic import powerlaw_edges

    n, e = 6000, 48000
    src, dst = powerlaw_edges(rng, n, e)
    assert np.bincount(dst, minlength=n).max() > 1000  # genuinely skewed
    g = build_graph(src, dst, n, pad_multiple=128)
    fg = build_fast_graph(g)
    E = int(g.num_edges)
    # the finer budget rule (ops/ell.py _chunk_budgets) bounds inflation
    # ~1.1x even on the Poisson(8) src side — and fewer slots = fewer
    # random-take rows, the step's real bottleneck (measured 101.49 vs
    # 105.41 ms/step vs the coarse rule)
    assert fg.dst_plan.num_slots / E < 1.2, fg.dst_plan.buckets1
    assert fg.src_plan.num_slots / E < 1.2, fg.src_plan.buckets1

    h = 8
    eq = jnp.asarray(rng.normal(size=(g.n_pad, h)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, h)), jnp.float32)
    for agg in ("sum", "sym"):
        got = sir_aggregate(fg, eq, ek, jnp.tanh, agg)
        exp = sir_aggregate(g, eq, ek, jnp.tanh, agg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=2e-4, rtol=2e-4)


def test_chunked_edge_cotangent_identical(rng):
    """set_edge_cotangent_chunks must not change any gradient: the
    chunked lax.map reconstruction is numerically identical to the
    single-take form (it exists to bound XLA compile time at full-graph
    scale — ROADMAP round 4)."""
    import sir_gcn_tpu.ops.ell as ell_mod

    g, *_ = make_graph(rng)
    fg = build_fast_graph(g, max_budget=16)
    eq = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(g.e_pad, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, 8)), jnp.float32)

    def loss(graph):
        def inner(eq, ek, e):
            out = sir_aggregate(graph, eq, ek, jnp.tanh, "sum", e=e)
            return jnp.sum(out * w)
        return inner

    try:
        ell_mod.set_edge_cotangent_chunks(1)
        base = jax.grad(loss(fg), argnums=(0, 1, 2))(eq, ek, e)
        ell_mod.set_edge_cotangent_chunks(4)
        assert g.e_pad % 4 == 0  # chunking actually engages
        chunked = jax.grad(loss(fg), argnums=(0, 1, 2))(eq, ek, e)
    finally:
        ell_mod.set_edge_cotangent_chunks(0)  # back to auto default
    for a, b in zip(chunked, base):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
