"""Edge cases: empty graphs, single nodes, self-loop-only graphs, ELL on
degenerate inputs."""

import jax.numpy as jnp
import numpy as np

from sir_gcn_tpu import batch_graphs, build_graph
from sir_gcn_tpu.ops import sir_aggregate, sum_pool
from sir_gcn_tpu.ops.ell import build_fast_graph


def test_graph_with_no_edges():
    g = build_graph(np.zeros(0, np.int64), np.zeros(0, np.int64), 4,
                    n_pad=8, e_pad=8)
    assert int(g.num_edges) == 0
    eq = jnp.ones((8, 4))
    out = sir_aggregate(g, eq, eq, jnp.tanh, "sum")
    assert np.allclose(np.asarray(out), 0.0)
    out = sir_aggregate(g, eq, eq, jnp.tanh, "max",
                        w_relation=jnp.ones((4, 2)))
    assert np.allclose(np.asarray(out), 0.0)


def test_fast_graph_with_no_edges():
    g = build_graph(np.zeros(0, np.int64), np.zeros(0, np.int64), 4,
                    n_pad=8, e_pad=8)
    fg = build_fast_graph(g)
    eq = jnp.ones((8, 4))
    out = sir_aggregate(fg, eq, eq, jnp.tanh, "sum")
    assert np.allclose(np.asarray(out), 0.0)


def test_single_node_self_loop(rng):
    g = build_graph(np.array([0]), np.array([0]), 1, n_pad=8, e_pad=8)
    x = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    out = sir_aggregate(g, x, x, jnp.tanh, "sym")
    # deg 1 both ways: sym scale = 1, message = tanh(2 x0)
    np.testing.assert_allclose(np.asarray(out)[0],
                               np.tanh(2 * np.asarray(x)[0]), atol=1e-5)


def test_batch_with_single_node_graphs(rng):
    gs = [(np.zeros(0, np.int64), np.zeros(0, np.int64), 1)] * 3
    gb = batch_graphs(gs, n_pad=8, e_pad=8, g_pad=4)
    x = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    pooled = np.asarray(sum_pool(gb, x))
    for i in range(3):
        np.testing.assert_allclose(pooled[i], np.asarray(x)[i], atol=1e-6)


def test_fast_graph_hub_only(rng):
    # every edge points at node 0
    e = 100
    g = build_graph(rng.integers(0, 16, e), np.zeros(e, np.int64), 16,
                    n_pad=16, e_pad=128)
    fg = build_fast_graph(g, max_budget=8)
    eq = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    ref = sir_aggregate(g, eq, ek, jnp.tanh, "sum")
    got = sir_aggregate(fg, eq, ek, jnp.tanh, "sum")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
