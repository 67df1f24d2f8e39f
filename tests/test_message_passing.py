"""sir_aggregate vs a naive edge-loop oracle of the reference equation
(models/conv.py:43-47,63-65)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import build_graph
from sir_gcn_tpu.ops import copy_src_aggregate, sir_aggregate, sir_aggregate_concat


def naive_sir(src, dst, n, eq, ek, act, agg, e=None, w=None, b=None):
    """Reference equation evaluated edge-by-edge in NumPy."""
    H = eq.shape[1]
    out_dim = w.shape[1] if w is not None else H
    msgs = [[] for _ in range(n)]
    in_deg = np.bincount(dst, minlength=n).astype(np.float64)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    in_norm = np.maximum(in_deg, 1) ** -0.5
    out_norm = np.maximum(out_deg, 1) ** -0.5
    for i, (s, d) in enumerate(zip(src, dst)):
        z = eq[d] + ek[s]
        if e is not None:
            z = z + e[i]
        m = act(z)
        if agg == "max":
            m = m @ w + (b if b is not None else 0.0)
        elif agg == "sym":
            m = m * out_norm[s] * in_norm[d]
        msgs[d].append(m)
    out = np.zeros((n, out_dim))
    for u in range(n):
        if not msgs[u]:
            continue
        arr = np.stack(msgs[u])
        if agg == "max":
            out[u] = arr.max(0)
        elif agg == "mean":
            out[u] = arr.mean(0)
        else:
            out[u] = arr.sum(0)
    return out


@pytest.mark.parametrize("agg", ["sum", "mean", "max", "sym"])
def test_sir_aggregate_matches_naive(rng, agg):
    n, e_cnt, h, o = 13, 40, 8, 5
    src = rng.integers(0, n, e_cnt)
    dst = rng.integers(0, n, e_cnt)
    g = build_graph(src, dst, n, n_pad=16, e_pad=64)
    eq = rng.normal(size=(16, h))
    ek = rng.normal(size=(16, h))
    w = rng.normal(size=(h, o))
    b = rng.normal(size=(o,))

    act = np.tanh
    expected = naive_sir(src, dst, n, eq, ek, act, agg,
                         w=w if agg == "max" else None,
                         b=b if agg == "max" else None)

    got = sir_aggregate(
        g, jnp.asarray(eq), jnp.asarray(ek), jnp.tanh, agg,
        w_relation=jnp.asarray(w) if agg == "max" else None,
        b_relation=jnp.asarray(b) if agg == "max" else None,
    )
    np.testing.assert_allclose(np.asarray(got)[:n], expected, atol=3e-4, rtol=1e-4)
    # padding rows produce zeros for linear aggs (max zero-fills too)
    assert np.allclose(np.asarray(got)[n:], 0.0) or agg == "max"


@pytest.mark.parametrize("agg", ["sum", "max", "sym"])
def test_sir_aggregate_with_edge_features(rng, agg):
    n, e_cnt, h, o = 9, 25, 6, 4
    src = rng.integers(0, n, e_cnt)
    dst = rng.integers(0, n, e_cnt)
    g = build_graph(src, dst, n, n_pad=16, e_pad=32)
    eq = rng.normal(size=(16, h))
    ek = rng.normal(size=(16, h))
    ef = rng.normal(size=(e_cnt, h))  # original edge order
    w = rng.normal(size=(h, o))

    expected = naive_sir(src, dst, n, eq, ek, np.tanh, agg, e=ef,
                         w=w if agg == "max" else None)

    # pad + permute edge features into sorted order like SIREConv does
    ef_pad = np.zeros((32, h))
    ef_pad[:e_cnt] = ef
    e_sorted = jnp.take(jnp.asarray(ef_pad), g.edge_perm, axis=0)

    got = sir_aggregate(
        g, jnp.asarray(eq), jnp.asarray(ek), jnp.tanh, agg, e=e_sorted,
        w_relation=jnp.asarray(w) if agg == "max" else None,
    )
    np.testing.assert_allclose(np.asarray(got)[:n], expected, atol=3e-4, rtol=1e-4)


def test_zero_degree_nodes_zero_fill(rng):
    # node 3 has no incoming edges -> sum/mean/max all give 0 (DGL semantics)
    src = np.array([0, 1])
    dst = np.array([1, 2])
    g = build_graph(src, dst, 4, n_pad=8, e_pad=8)
    eq = jnp.asarray(rng.normal(size=(8, 4)))
    ek = jnp.asarray(rng.normal(size=(8, 4)))
    w = jnp.asarray(rng.normal(size=(4, 4)))
    for agg in ["sum", "mean", "sym"]:
        out = sir_aggregate(g, eq, ek, jnp.tanh, agg)
        assert np.allclose(np.asarray(out)[3], 0.0)
    out = sir_aggregate(g, eq, ek, jnp.tanh, "max", w_relation=w)
    assert np.allclose(np.asarray(out)[3], 0.0)


def test_edge_mask_drops_messages(rng):
    src = np.array([0, 1, 2])
    dst = np.array([2, 2, 0])
    g = build_graph(src, dst, 3, n_pad=8, e_pad=8)
    eq = jnp.asarray(rng.normal(size=(8, 4)))
    ek = jnp.asarray(rng.normal(size=(8, 4)))
    full = sir_aggregate(g, eq, ek, jnp.tanh, "sum")
    # drop the sorted edge that targets node 0 (dst sorted => it is first)
    mask = jnp.asarray(np.array([False, True, True] + [False] * 5))
    dropped = sir_aggregate(g, eq, ek, jnp.tanh, "sum", edge_mask=mask)
    assert np.allclose(np.asarray(dropped)[0], 0.0)
    np.testing.assert_allclose(
        np.asarray(dropped)[2], np.asarray(full)[2], atol=1e-6
    )


def test_concat_form_matches_naive(rng):
    n, e_cnt, h = 7, 20, 5
    src = rng.integers(0, n, e_cnt)
    dst = rng.integers(0, n, e_cnt)
    g = build_graph(src, dst, n, n_pad=8, e_pad=32)
    x = rng.normal(size=(8, h))
    W = rng.normal(size=(2 * h, 3))

    def gfun(m):
        return jnp.tanh(m @ jnp.asarray(W))

    got = sir_aggregate_concat(g, jnp.asarray(x), jnp.asarray(x), gfun, "sum")

    out = np.zeros((n, 3))
    for s, d in zip(src, dst):
        out[d] += np.tanh(np.concatenate([x[d], x[s]]) @ W)
    np.testing.assert_allclose(np.asarray(got)[:n], out, atol=2e-4, rtol=1e-4)


def test_concat_form_edge_column_order(rng):
    """Pins the SIREConvBase concat order to the reference CODE —
    torch.cat((edges.dst['eq'], edges.src['ek'], edges.data['e'])),
    reference conv.py:201 — so message-MLP weights port verbatim
    (ADVICE r2). Uses an asymmetric g so any column permutation fails."""
    n, e_cnt, h, he = 7, 20, 5, 3
    src = rng.integers(0, n, e_cnt)
    dst = rng.integers(0, n, e_cnt)
    g = build_graph(src, dst, n, n_pad=8, e_pad=32)
    x = rng.normal(size=(8, h))
    ef = np.zeros((32, he))
    ef[:e_cnt] = rng.normal(size=(e_cnt, he))
    W = rng.normal(size=(2 * h + he, 4))

    def gfun(m):
        return jnp.tanh(m @ jnp.asarray(W))

    # e must be in SORTED edge order for sir_aggregate_concat
    perm = np.asarray(g.edge_perm)
    got = sir_aggregate_concat(g, jnp.asarray(x), jnp.asarray(x), gfun,
                               "sum", e=jnp.asarray(ef[perm]))

    out = np.zeros((n, 4))
    for i, (s, d) in enumerate(zip(src, dst)):
        out[d] += np.tanh(np.concatenate([x[d], x[s], ef[i]]) @ W)
    np.testing.assert_allclose(np.asarray(got)[:n], out, atol=2e-4,
                               rtol=1e-4)


def test_copy_src_aggregate(rng):
    n = 6
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 1])
    g = build_graph(src, dst, n, n_pad=8, e_pad=8)
    x = rng.normal(size=(8, 3))
    got = copy_src_aggregate(g, jnp.asarray(x), "sum")
    out = np.zeros((n, 3))
    for s, d in zip(src, dst):
        out[d] += x[s]
    np.testing.assert_allclose(np.asarray(got)[:n], out, atol=1e-6)


def test_jit_and_grad(rng):
    n, e_cnt, h = 10, 30, 4
    src = rng.integers(0, n, e_cnt)
    dst = rng.integers(0, n, e_cnt)
    g = build_graph(src, dst, n, n_pad=16, e_pad=32)
    eq = jnp.asarray(rng.normal(size=(16, h)))
    ek = jnp.asarray(rng.normal(size=(16, h)))

    @jax.jit
    def loss(eq, ek):
        return jnp.sum(sir_aggregate(g, eq, ek, jnp.tanh, "sym") ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(eq, ek)
    assert np.isfinite(val)
    assert all(np.isfinite(np.asarray(gr)).all() for gr in grads)
    # numeric gradient check on one coordinate (central diff; f32 noise)
    eps = 1e-2
    hi = loss(eq.at[2, 1].add(eps), ek)
    lo = loss(eq.at[2, 1].add(-eps), ek)
    num = (hi - lo) / (2 * eps)
    np.testing.assert_allclose(num, np.asarray(grads[0])[2, 1], rtol=5e-2)
