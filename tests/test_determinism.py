"""Determinism: same seed => bit-identical runs (the TPU formalization of
the reference's determinism kit, ``ogbn-arxiv/train.py:14-24`` — our
segment reductions are deterministic by construction, host RNGs are
seeded, and dropout keys are threaded from the run seed)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_harness_runs_are_reproducible():
    from experiments.dictionary_lookup.train import main

    args = ["--nodes", "4", "--samples", "80", "--nhidden", "16",
            "--dropout", "0.3", "--epochs", "5", "--batch-size", "32",
            "--nruns", "1", "--log-every", "1000"]
    r1 = main(args)
    r2 = main(args)
    assert r1 == r2


def test_ell_aggregate_bitwise_deterministic(rng):
    import jax.numpy as jnp

    from sir_gcn_tpu import build_fast_graph, build_graph
    from sir_gcn_tpu.ops import sir_aggregate

    g = build_graph(rng.integers(0, 50, 300), rng.integers(0, 50, 300),
                    50, n_pad=56, e_pad=304)
    fg = build_fast_graph(g)
    eq = jnp.asarray(rng.normal(size=(56, 8)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(56, 8)), jnp.float32)
    a = np.asarray(sir_aggregate(fg, eq, ek, jnp.tanh, "sym"))
    b = np.asarray(sir_aggregate(fg, eq, ek, jnp.tanh, "sym"))
    assert (a == b).all()  # bitwise, not allclose
