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


@pytest.mark.parametrize("agg", ["sum", "mean", "sym"])
@pytest.mark.parametrize("with_edge", [False, True])
def test_pallas_static_scale_matches_dynamic(rng, agg, with_edge):
    """static_scale=True (host-precomputed per-slot scales) must match the
    dynamic path fed the canonical mask/degree-derived edge_scale."""
    from sir_gcn_tpu.ops.ell import ell_sir_aggregate

    fg, g = make_fg(rng, skew=True)
    H = 128
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    e = (jnp.asarray(rng.normal(size=(g.e_pad, H)), jnp.float32)
         if with_edge else jnp.zeros((0,), jnp.float32))
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)

    # canonical dynamic scale, as sir_aggregate computes it
    scale = np.asarray(g.edge_mask, np.float64)
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    ind = np.maximum(np.asarray(g.in_deg, np.float64), 1.0)
    outd = np.maximum(np.asarray(g.out_deg, np.float64), 1.0)
    if agg == "sym":
        scale = scale * (outd ** -0.5)[src] * (ind ** -0.5)[dst]
    if agg == "mean":
        scale = scale / ind[dst]  # division folded, like the static plan
        agg_dyn = "sum"           # so compare against dynamic *sum*
    else:
        agg_dyn = agg
    scale = jnp.asarray(scale, jnp.float32)

    for use_pallas, kw in [(False, {}), (True, {})]:
        dyn = make_ell_sir_aggregate(fg, jnp.tanh, agg_dyn,
                                     with_edge=with_edge) \
            if not use_pallas else \
            make_ell_sir_aggregate_pallas(fg, jnp.tanh, agg_dyn,
                                          with_edge=with_edge,
                                          interpret=True)
        sta = make_ell_sir_aggregate(fg, jnp.tanh, agg,
                                     with_edge=with_edge,
                                     static_scale=True) \
            if not use_pallas else \
            make_ell_sir_aggregate_pallas(fg, jnp.tanh, agg,
                                          with_edge=with_edge,
                                          interpret=True,
                                          static_scale=True)
        ref = dyn(eq, ek, e, scale)
        got = sta(eq, ek, e, scale)  # edge_scale arg ignored by static
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)

        def loss(f):
            def inner(eq, ek, e):
                return jnp.sum(f(eq, ek, e, scale) * w)
            return inner

        argn = (0, 1, 2) if with_edge else (0, 1)
        g_ref = jax.grad(loss(dyn), argnums=argn)(eq, ek, e)
        g_got = jax.grad(loss(sta), argnums=argn)(eq, ek, e)
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("with_edge", [False, True])
def test_pallas_rowwise_activation_general_path(rng, with_edge):
    """A row-mixing activation (non-diagonal Jacobian) must get exact
    grads via the general path (act_elementwise=False)."""
    fg, g = make_fg(rng, skew=True)
    H = 128
    # row-mixing but closure-free (Pallas kernels cannot capture array
    # constants; capturing activations are dispatched to the XLA builder)
    act = lambda z: jax.nn.relu(z - 0.5 * z.mean(-1, keepdims=True))

    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    e = (jnp.asarray(rng.normal(size=(g.e_pad, H)), jnp.float32)
         if with_edge else jnp.zeros((0,), jnp.float32))
    scale = jnp.asarray(rng.random(g.e_pad), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)

    ref_f = make_ell_sir_aggregate(fg, act, "sum", with_edge=with_edge)
    pal_f = make_ell_sir_aggregate_pallas(
        fg, act, "sum", with_edge=with_edge, interpret=True,
        act_elementwise=False)

    ref = ref_f(eq, ek, e, scale)
    got = pal_f(eq, ek, e, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)

    def loss(f):
        def inner(eq, ek, e):
            return jnp.sum(f(eq, ek, e, scale) * w)
        return inner

    argn = (0, 1, 2) if with_edge else (0, 1)
    g_ref = jax.grad(loss(ref_f), argnums=argn)(eq, ek, e)
    g_got = jax.grad(loss(pal_f), argnums=argn)(eq, ek, e)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


def test_activation_elementwise_probe(rng):
    """The dispatcher's Jacobian probe: elementwise activations detected,
    row-mixing / parameter-closing ones conservatively rejected."""
    from functools import partial

    from sir_gcn_tpu.ops.ell import activation_is_elementwise

    H = 16
    assert activation_is_elementwise(jnp.tanh, H)
    assert activation_is_elementwise(jax.nn.relu, H)
    assert activation_is_elementwise(
        partial(jax.nn.leaky_relu, negative_slope=0.2), H)
    assert activation_is_elementwise(jax.nn.gelu, H)

    mix = jnp.asarray(rng.normal(size=(H, H)), jnp.float32)
    assert not activation_is_elementwise(lambda z: z @ mix, H)
    assert not activation_is_elementwise(
        lambda z: jax.nn.softmax(z, axis=-1), H)
    assert not activation_is_elementwise(
        lambda z: z - z.mean(-1, keepdims=True), H)
    # wrong output shape / failing activations are rejected, not crashed
    assert not activation_is_elementwise(lambda z: z.sum(-1), H)
    assert not activation_is_elementwise(lambda z: z @ mix[: H // 2], H)

    def traced_closure_case():
        # activation closing over a traced parameter (DictionaryLookup's
        # MLP-augmented sigma): must be rejected inside a jit trace.
        def f(p):
            act = lambda z: jax.nn.relu(z * p)
            return jnp.float32(activation_is_elementwise(act, H))
        return jax.jit(f)(jnp.float32(2.0))

    assert np.asarray(traced_closure_case()) == 0.0


def test_dispatch_capturing_activation_falls_back_to_xla(rng):
    """ell_sir_aggregate with use_pallas=True but an activation closing
    over an array (MLP-augmented sigma pattern) must fall back to the
    XLA ELL builder instead of hitting the Pallas capture error."""
    from sir_gcn_tpu.ops.ell import (
        activation_pallas_compatible,
        ell_sir_aggregate,
    )

    fg, g = make_fg(rng)
    H = 32
    mix = jnp.asarray(rng.normal(size=(H, H)) / np.sqrt(H), jnp.float32)
    act = lambda z: jax.nn.relu(jnp.tanh(z) @ mix)
    assert not activation_pallas_compatible(act, H)
    assert activation_pallas_compatible(jnp.tanh, H)

    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ref = make_ell_sir_aggregate(fg, act, "sum")(
        eq, ek, jnp.zeros((0,)), fg.edge_mask.astype(jnp.float32))
    got = ell_sir_aggregate(fg, eq, ek, act, "sum", use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_legacy_bwd_kernels_match_oracle(rng):
    """Direct coverage for the benchmark-only kernels not on the
    production path anymore (bucket_bcast_act_reduce_bwd,
    bucket_scaled_reduce) so they don't rot silently."""
    from sir_gcn_tpu.ops.pallas import (
        bucket_bcast_act_reduce_bwd,
        bucket_scaled_reduce,
    )

    R, B, H = 8, 4, 128
    ekg = jnp.asarray(rng.normal(size=(R * B, H)), jnp.float32)
    eq_rows = jnp.asarray(rng.normal(size=(R, H)), jnp.float32)
    scale = jnp.asarray(rng.random((R, B)), jnp.float32)
    g_rows = jnp.asarray(rng.normal(size=(R, H)), jnp.float32)

    g_z, g_eq = bucket_bcast_act_reduce_bwd(
        ekg, eq_rows, scale, g_rows, B, jnp.tanh, interpret=True)
    z = ekg.reshape(R, B, H) + eq_rows[:, None, :]
    want_gz = ((1 - jnp.tanh(z) ** 2)
               * scale[:, :, None] * g_rows[:, None, :])
    np.testing.assert_allclose(np.asarray(g_z),
                               np.asarray(want_gz.reshape(R * B, H)),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_eq),
                               np.asarray(want_gz.sum(axis=1)),
                               atol=1e-4, rtol=1e-5)

    rows = bucket_scaled_reduce(ekg, scale, B, interpret=True)
    want = (ekg.reshape(R, B, H) * scale[:, :, None]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_max_path_b_none_grads(rng):
    """make_ell_sir_aggregate_max with b=None: forward supports it and
    backward must too (regression: f_bwd crashed on a @ w + None)."""
    import jax as _jax

    from sir_gcn_tpu.ops.ell import make_ell_sir_aggregate_max

    fg, g = make_fg(rng)
    H, O = 8, 6
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, O)), jnp.float32)
    scale = fg.edge_mask.astype(jnp.float32)
    f = make_ell_sir_aggregate_max(fg, jnp.tanh)

    def loss(eq, ek, w):
        return jnp.sum(f(eq, ek, jnp.zeros((0,)), scale, w, None) ** 2)

    grads = _jax.grad(loss, argnums=(0, 1, 2))(eq, ek, w)
    assert all(bool(jnp.isfinite(x).all()) for x in grads)


def test_pallas_fused_bwd_take_variant(rng):
    """The lane-concat fused backward take (fuse_bwd_take=True) stays
    gradient-exact vs the XLA reference (it is default-off on perf
    grounds — gather_probe3: 512 B rows spill the random-access cache at
    arxiv scale — but remains supported for narrow models)."""
    fg, g = make_fg(rng, skew=False)
    H = 128
    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    scale = jnp.asarray(rng.random(g.e_pad), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    e0 = jnp.zeros((0,), jnp.float32)

    ref_f = make_ell_sir_aggregate(fg, jnp.tanh, "sum")
    fus_f = make_ell_sir_aggregate_pallas(fg, jnp.tanh, "sum",
                                          interpret=True,
                                          fuse_bwd_take=True)

    def loss(f):
        return lambda a, b: jnp.sum(f(a, b, e0, scale) * w)

    ref_g = jax.grad(loss(ref_f), argnums=(0, 1))(eq, ek)
    got_g = jax.grad(loss(fus_f), argnums=(0, 1))(eq, ek)
    for a, b in zip(got_g, ref_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)
