"""RCM locality reordering: permutation validity, bandwidth reduction,
equivalence of aggregation under relabeling (scipy and NumPy paths)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import (
    bandwidth,
    build_graph,
    permute_nodes,
    rcm_order,
)
from sir_gcn_tpu.graph import _rcm_numpy
from sir_gcn_tpu.ops import sir_aggregate
from sir_gcn_tpu.ops.ell import build_fast_graph


def _ring_of_cliques(rng, n_cliques=16, k=8, extra=50):
    """A graph with strong community structure (RCM's best case)."""
    src, dst = [], []
    for c in range(n_cliques):
        base = c * k
        for i in range(k):
            for j in range(k):
                if i != j:
                    src.append(base + i)
                    dst.append(base + j)
        nxt = ((c + 1) % n_cliques) * k
        src.append(base)
        dst.append(nxt)
    n = n_cliques * k
    src += list(rng.integers(0, n, extra))
    dst += list(rng.integers(0, n, extra))
    return np.asarray(src), np.asarray(dst), n


@pytest.mark.parametrize("impl", ["auto", "numpy"])
def test_rcm_is_permutation(rng, impl):
    src, dst, n = _ring_of_cliques(rng)
    fn = _rcm_numpy if impl == "numpy" else rcm_order
    perm = fn(src, dst, n)
    assert sorted(perm.tolist()) == list(range(n))


@pytest.mark.parametrize("impl", ["auto", "numpy"])
def test_rcm_reduces_bandwidth(rng, impl):
    # scramble node ids first so the input order carries no locality
    src, dst, n = _ring_of_cliques(rng, extra=0)
    scramble = rng.permutation(n)
    src, dst = scramble[src], scramble[dst]
    fn = _rcm_numpy if impl == "numpy" else rcm_order
    perm = fn(src, dst, n)
    s2, d2, _ = permute_nodes(src, dst, perm)
    assert bandwidth(s2, d2) < 0.5 * bandwidth(src, dst)


def test_rcm_handles_isolated_nodes(rng):
    src = np.asarray([0, 1])
    dst = np.asarray([1, 2])
    for fn in (rcm_order, _rcm_numpy):
        perm = fn(src, dst, 10)  # nodes 3..9 isolated
        assert sorted(perm.tolist()) == list(range(10))


def test_aggregation_equivariant_under_relabeling(rng):
    """SIR aggregation commutes with node relabeling: computing in RCM
    space and mapping back equals computing in original space."""
    n, e, h = 96, 600, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    eq = rng.normal(size=(n, h)).astype(np.float32)
    ek = rng.normal(size=(n, h)).astype(np.float32)

    g = build_graph(src, dst, n, n_pad=n, e_pad=e)
    ref = np.asarray(sir_aggregate(g, jnp.asarray(eq), jnp.asarray(ek),
                                   jnp.tanh, "sym"))

    perm = rcm_order(src, dst, n)
    s2, d2, relabel = permute_nodes(src, dst, perm)
    g2 = build_fast_graph(build_graph(s2, d2, n, n_pad=n, e_pad=e))
    out2 = np.asarray(sir_aggregate(
        g2, jnp.asarray(eq[perm]), jnp.asarray(ek[perm]), jnp.tanh, "sym"))
    np.testing.assert_allclose(out2[relabel], ref, atol=2e-5, rtol=1e-5)
