"""Round-5 fused kernels: the fused-edge (SIREConv) and max-aggregation
Pallas paths vs the XLA ELL reference builders (interpret mode on CPU).

These are the last two aggregate variants that ran as XLA-composed slot
ops (VERDICT r4 item 1); grads are checked against the same custom-VJP
XLA builders that are themselves oracle-tested vs the CSR path in
tests/test_ell.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import build_graph
from sir_gcn_tpu.ops.ell import (
    build_fast_graph,
    make_ell_sir_aggregate,
    make_ell_sir_aggregate_max,
    make_ell_sir_aggregate_max_pallas,
    make_ell_sir_aggregate_pallas_fused_edge,
)


def make_fg(rng, skew=False, n=40, e=300, max_budget=16):
    dst = (np.where(rng.random(e) < 0.5, 0, rng.integers(0, n, e))
           if skew else rng.integers(0, n, e))
    src = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=64, e_pad=512)
    return build_fast_graph(g, max_budget=max_budget), g


# ======================================================================
# fused-edge path
# ======================================================================

@pytest.mark.parametrize("skew", [False, True])
@pytest.mark.parametrize("agg", ["sum", "sym"])
def test_fused_edge_matches_composed_reference(rng, skew, agg):
    fg, g = make_fg(rng, skew)
    H, De = 128, 12  # odd basis width exercises the De->8k padding
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    eb = jnp.asarray(rng.normal(size=(g.e_pad, De)), jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(De, H)) * 0.3, jnp.float32)
    scale = jnp.asarray(rng.random(g.e_pad), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)

    ref_f = make_ell_sir_aggregate(fg, jnp.tanh, agg, with_edge=True)
    fus_f = make_ell_sir_aggregate_pallas_fused_edge(
        fg, jnp.tanh, agg, interpret=True)

    ref = ref_f(eq, ek, eb @ w_e, scale)
    got = fus_f(eq, ek, eb, w_e, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    def ref_loss(eq, ek, w_e):
        return jnp.sum(ref_f(eq, ek, eb @ w_e, scale) * w)

    def fus_loss(eq, ek, w_e):
        return jnp.sum(fus_f(eq, ek, eb, w_e, scale) * w)

    ref_g = jax.grad(ref_loss, argnums=(0, 1, 2))(eq, ek, w_e)
    got_g = jax.grad(fus_loss, argnums=(0, 1, 2))(eq, ek, w_e)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=2e-3)


def test_fused_edge_static_scale_and_lane_padding(rng):
    """H=96 engages the pad-to-128 wrapper; static per-slot scales must
    match the dynamic-scale result exactly (no DropEdge)."""
    fg, g = make_fg(rng)
    H, De = 96, 8
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    eb = jnp.asarray(rng.normal(size=(g.e_pad, De)), jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(De, H)) * 0.3, jnp.float32)

    ref_f = make_ell_sir_aggregate(fg, jnp.tanh, "sym", with_edge=True)
    # the reference's dynamic scale for sym
    from sir_gcn_tpu.ops.ell import static_edge_scale

    scale = jnp.asarray(static_edge_scale(
        "sym", np.asarray(g.src), np.asarray(g.dst),
        np.asarray(g.edge_mask), np.asarray(g.in_deg),
        np.asarray(g.out_deg)), jnp.float32)
    fus_f = make_ell_sir_aggregate_pallas_fused_edge(
        fg, jnp.tanh, "sym", interpret=True, static_scale=True)

    ref = ref_f(eq, ek, eb @ w_e, scale)
    got = fus_f(eq, ek, eb, w_e, jnp.zeros((g.e_pad,), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_fused_edge_onehot_basis_is_embedding(rng):
    """An Embedding edge encoder (ZINC SIREConv2,
    benchmark-datasets/zinc/model.py:12-15) == one-hot basis @ table;
    the table gradient comes out of the in-kernel g_we accumulation."""
    fg, g = make_fg(rng)
    H, T = 128, 4
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    types = rng.integers(0, T, g.e_pad)
    table = jnp.asarray(rng.normal(size=(T, H)) * 0.3, jnp.float32)
    onehot = jnp.asarray(np.eye(T, dtype=np.float32)[types])
    scale = jnp.asarray(np.asarray(g.edge_mask, np.float32))
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)

    ref_f = make_ell_sir_aggregate(fg, jnp.tanh, "sum", with_edge=True)
    fus_f = make_ell_sir_aggregate_pallas_fused_edge(
        fg, jnp.tanh, "sum", interpret=True)

    def ref_loss(tab):
        return jnp.sum(ref_f(eq, ek, jnp.take(tab, types, 0), scale) * w)

    def fus_loss(tab):
        return jnp.sum(fus_f(eq, ek, onehot, tab, scale) * w)

    np.testing.assert_allclose(float(fus_loss(table)),
                               float(ref_loss(table)), rtol=1e-5)
    ref_g = jax.grad(ref_loss)(table)
    got_g = jax.grad(fus_loss)(table)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=5e-4, rtol=2e-3)


def test_fused_edge_bf16_close_to_f32(rng):
    fg, g = make_fg(rng)
    H, De = 128, 8
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    eb = jnp.asarray(rng.normal(size=(g.e_pad, De)), jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(De, H)) * 0.3, jnp.float32)
    scale = jnp.asarray(np.asarray(g.edge_mask, np.float32))

    f32 = make_ell_sir_aggregate_pallas_fused_edge(
        fg, jnp.tanh, "sum", interpret=True)
    bf16 = make_ell_sir_aggregate_pallas_fused_edge(
        fg, jnp.tanh, "sum", interpret=True, edge_dtype=jnp.bfloat16)
    a = np.asarray(f32(eq, ek, eb, w_e, scale))
    b = np.asarray(bf16(eq, ek, eb, w_e, scale))
    np.testing.assert_allclose(a, b, atol=0.15, rtol=0.05)


# ======================================================================
# max path
# ======================================================================

@pytest.mark.parametrize("skew", [False, True])
@pytest.mark.parametrize("with_edge", [False, True])
def test_max_pallas_matches_xla_builder(rng, skew, with_edge):
    fg, g = make_fg(rng, skew)
    H, O = 128, 128
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    e = (jnp.asarray(rng.normal(size=(g.e_pad, H)), jnp.float32)
         if with_edge else jnp.zeros((0,), jnp.float32))
    w = jnp.asarray(rng.normal(size=(H, O)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(O,)), jnp.float32)
    valid = jnp.asarray(np.asarray(g.edge_mask, np.float32))
    gw = jnp.asarray(rng.normal(size=(g.n_pad, O)), jnp.float32)

    ref_f = make_ell_sir_aggregate_max(fg, jnp.tanh, with_edge=with_edge)
    pal_f = make_ell_sir_aggregate_max_pallas(
        fg, jnp.tanh, with_edge=with_edge, interpret=True)

    ref = ref_f(eq, ek, e, valid, w, b)
    got = pal_f(eq, ek, e, valid, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    argn = (0, 1, 2, 4, 5) if with_edge else (0, 1, 4, 5)

    def loss(f):
        def inner(*a):
            return jnp.sum(f(*a) * gw)
        return inner

    args = (eq, ek, e, valid, w, b)
    ref_g = jax.grad(loss(ref_f), argnums=argn)(*args)
    got_g = jax.grad(loss(pal_f), argnums=argn)(*args)
    for a, r in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=2e-3)


def test_max_pallas_lane_padding(rng):
    """H=96 / O=40 exercise the H and O pad-to-128 wrappers."""
    fg, g = make_fg(rng)
    H, O = 96, 40
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, O)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(O,)), jnp.float32)
    valid = jnp.asarray(np.asarray(g.edge_mask, np.float32))
    e0 = jnp.zeros((0,), jnp.float32)

    ref = make_ell_sir_aggregate_max(fg, jnp.tanh)(eq, ek, e0, valid, w, b)
    got = make_ell_sir_aggregate_max_pallas(fg, jnp.tanh, interpret=True)(
        eq, ek, e0, valid, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    gw = jnp.asarray(rng.normal(size=(g.n_pad, O)), jnp.float32)

    def loss(f):
        return lambda eq, ek, w, b: jnp.sum(f(eq, ek, e0, valid, w, b) * gw)

    ref_g = jax.grad(loss(make_ell_sir_aggregate_max(fg, jnp.tanh)),
                     argnums=(0, 1, 2, 3))(eq, ek, w, b)
    got_g = jax.grad(
        loss(make_ell_sir_aggregate_max_pallas(fg, jnp.tanh,
                                               interpret=True)),
        argnums=(0, 1, 2, 3))(eq, ek, w, b)
    for a, r in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=2e-3)


def test_max_pallas_tie_splitting(rng):
    """Duplicate edges (same src, dst) produce exact ties; the Pallas
    backward must split cotangents over winners exactly like the XLA
    builder (counts-division semantics)."""
    n = 16
    src = np.array([0, 0, 1, 2, 2, 2, 3] * 2)  # duplicates => ties
    dst = np.array([5, 5, 6, 7, 7, 7, 8] * 2)
    g = build_graph(src, dst, n, n_pad=16, e_pad=16)
    fg = build_fast_graph(g, max_budget=4)
    H = 128
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, H)) * 0.2, jnp.float32)
    b = jnp.zeros((H,), jnp.float32)
    valid = jnp.asarray(np.asarray(g.edge_mask, np.float32))
    e0 = jnp.zeros((0,), jnp.float32)
    gw = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)

    def loss(f):
        return lambda eq, ek: jnp.sum(f(eq, ek, e0, valid, w, b) * gw)

    ref_g = jax.grad(loss(make_ell_sir_aggregate_max(fg, jnp.tanh)),
                     argnums=(0, 1))(eq, ek)
    got_g = jax.grad(
        loss(make_ell_sir_aggregate_max_pallas(fg, jnp.tanh,
                                               interpret=True)),
        argnums=(0, 1))(eq, ek)
    for a, r in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=2e-3)


# ======================================================================
# dispatch
# ======================================================================

def test_sir_aggregate_e_basis_falls_back_off_tpu(rng):
    """On CPU (no pallas) the e_basis route must compute e = basis @ w_e
    and match the explicit-e call bitwise."""
    from sir_gcn_tpu.ops.message_passing import sir_aggregate

    fg, g = make_fg(rng)
    H, De = 32, 6
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    eb = jnp.asarray(rng.normal(size=(g.e_pad, De)), jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(De, H)) * 0.3, jnp.float32)

    a = sir_aggregate(fg, eq, ek, jnp.tanh, "sum",
                      e=(eb @ w_e).astype(jnp.float32))
    bb = sir_aggregate(fg, eq, ek, jnp.tanh, "sum",
                       e_basis=eb, w_edge=w_e)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_sireconv_uses_basis_route_and_matches(rng):
    """SIREConv with the default Linear encoder and inactive dropout
    must produce the same output through the new e_basis call as the old
    explicit-projection path (here: CPU fallback, same math)."""
    import flax.linen as nn

    from sir_gcn_tpu.models import SIREConv

    fg, g = make_fg(rng)
    H, De = 24, 5
    nfeat = jnp.asarray(rng.normal(size=(g.n_pad, 16)), jnp.float32)
    efeat = jnp.asarray(rng.normal(size=(g.e_pad, De)), jnp.float32)

    conv = SIREConv(hidden_dim=H, output_dim=8, activation=jnp.tanh,
                    dropout=0.0, agg_type="sum")
    vs = conv.init(jax.random.PRNGKey(0), fg, nfeat, efeat)
    out = conv.apply(vs, fg, nfeat, efeat)

    # hand-computed old-style path with the same params
    p = jax.tree_util.tree_map(lambda x: x, vs["params"])
    k = lambda name: p[name]["Dense_0"]["kernel"]
    bb = lambda name: p[name]["Dense_0"]["bias"]
    eq = nfeat @ k("linear_query") + bb("linear_query")
    ek = nfeat @ k("linear_key")
    e = jnp.take(efeat @ k("linear_edge"), g.edge_perm, axis=0)
    from sir_gcn_tpu.ops.message_passing import sir_aggregate

    agg = sir_aggregate(fg, eq, ek, jnp.tanh, "sum", e=e)
    want = agg @ k("linear_relation") + bb("linear_relation")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
