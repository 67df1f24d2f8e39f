"""Scale guards for the expensive full-graph variants (VERDICT r3
item 3, re-measured round 4 with tools/edge_compile_probe.py):
edge-feature (SIREConv) aggregation above the measured long-compile
scale must warn loudly with its measured costs (~90-170 s first compile,
~120 ms/iter at 2.5M edges; chained-steps-in-one-jit still pathological)
instead of silently stalling the user's first step, and full-graph max
aggregation must emit its documented cost warning."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import build_graph
from sir_gcn_tpu.ops import message_passing as mp
from sir_gcn_tpu.ops import sir_aggregate


@pytest.fixture(autouse=True)
def _reset_guard_state():
    mp._ALLOW_LARGE_EDGE_AGG = False
    mp._MAX_AGG_WARNED.clear()
    mp._EDGE_AGG_WARNED.clear()
    yield
    mp._ALLOW_LARGE_EDGE_AGG = False
    mp._MAX_AGG_WARNED.clear()
    mp._EDGE_AGG_WARNED.clear()


def _big_graph(rng, e_pad):
    n = 1024
    e = e_pad - 8
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    return build_graph(src, dst, n, n_pad=n, e_pad=e_pad)


def test_edge_features_above_limit_warn_once(rng):
    g = _big_graph(rng, mp.EDGE_FEATURE_EDGE_LIMIT + 8)
    h = 4
    eq = jnp.zeros((g.n_pad, h))
    e = jnp.zeros((g.e_pad, h))
    with pytest.warns(UserWarning, match="edge features"):
        out = sir_aggregate(g, eq, eq, jnp.tanh, "sum", e=e)
    assert out.shape == (g.n_pad, h)
    # second call on the same size: silent (warn once per graph size)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        sir_aggregate(g, eq, eq, jnp.tanh, "sum", e=e)


def test_edge_feature_guard_override_silences(rng):
    g = _big_graph(rng, mp.EDGE_FEATURE_EDGE_LIMIT + 8)
    h = 4
    eq = jnp.zeros((g.n_pad, h))
    e = jnp.zeros((g.e_pad, h))
    mp.allow_large_edge_aggregate(True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = sir_aggregate(g, eq, eq, jnp.tanh, "sum", e=e)
    assert out.shape == (g.n_pad, h)


def test_max_agg_above_limit_warns_once(rng):
    g = _big_graph(rng, mp.MAX_AGG_WARN_EDGES + 8)
    h = 4
    eq = jnp.zeros((g.n_pad, h))
    w = jnp.eye(h)
    with pytest.warns(UserWarning, match="max aggregation"):
        sir_aggregate(g, eq, eq, jnp.tanh, "max", w_relation=w)
    # second call on the same size: silent (warn once per graph size)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        sir_aggregate(g, eq, eq, jnp.tanh, "max", w_relation=w)


def test_small_graphs_unaffected(rng):
    src = rng.integers(0, 16, 64).astype(np.int64)
    dst = rng.integers(0, 16, 64).astype(np.int64)
    g = build_graph(src, dst, 16, n_pad=16, e_pad=64)
    h = 4
    eq = jnp.zeros((g.n_pad, h))
    e = jnp.zeros((g.e_pad, h))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = sir_aggregate(g, eq, eq, jnp.tanh, "sum", e=e)
        out2 = sir_aggregate(g, eq, eq, jnp.tanh, "max",
                             w_relation=jnp.eye(h))
    assert out.shape == (16, h) and out2.shape == (16, h)
