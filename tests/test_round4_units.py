"""Round-4 unit coverage: batched device uploads, multi-worker env
gating, plan-memo degree sensitivity, and unit-mesh collective elision
equivalence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import build_graph
from sir_gcn_tpu.ops.ell import (
    _batch_device_put,
    build_fast_graph,
    last_build_memo_hit,
)
from sir_gcn_tpu.parallel.multihost import _multiworker_env


def test_batch_device_put_roundtrip(rng):
    arrays = [
        (rng.integers(0, 100, 17).astype(np.int64), np.int32),
        (rng.random(5).astype(np.float64), np.float32),
        (np.arange(3, dtype=np.int64), np.int32),
        (rng.random(9).astype(np.float32), np.float32),
    ]
    out = _batch_device_put(arrays)
    assert len(out) == len(arrays)
    for (src, dt), dev in zip(arrays, out):
        assert dev.dtype == jnp.dtype(dt)
        np.testing.assert_array_equal(np.asarray(dev),
                                      src.astype(dt))


def test_batch_device_put_single_group():
    out = _batch_device_put([(np.arange(4), np.int32)])
    np.testing.assert_array_equal(np.asarray(out[0]), np.arange(4))


@pytest.mark.parametrize("env,expect", [
    ({}, False),
    ({"TPU_WORKER_ID": "0"}, False),                    # single-host VM
    ({"TPU_WORKER_ID": "0", "TPU_WORKER_HOSTNAMES": "h0"}, False),
    ({"TPU_WORKER_ID": "1"}, True),                     # worker 1 => >1
    ({"TPU_WORKER_HOSTNAMES": "h0,h1"}, True),
    ({"COORDINATOR_ADDRESS": "1.2.3.4:8476"}, True),
    ({"SLURM_JOB_NUM_NODES": "1"}, False),
    ({"SLURM_JOB_NUM_NODES": "4"}, True),
    ({"OMPI_COMM_WORLD_SIZE": "2"}, True),
    ({"TPU_WORKER_ID": "not-an-int"}, False),
])
def test_multiworker_env_gating(env, expect):
    assert _multiworker_env(env) is expect


def test_fast_graph_memo_keys_on_degrees(rng):
    """Identical edge arrays with different degree arrays must NOT share
    a memo entry (the static scales bake degrees in)."""
    n, e = 64, 256
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    g = build_graph(src, dst, n, n_pad=64, e_pad=256)
    fg1 = build_fast_graph(g)
    assert not last_build_memo_hit()
    # same structure, doubled in-degrees (as a sliced/deserialized batch
    # might carry): sym scales must differ
    g2 = dataclasses.replace(g, in_deg=g.in_deg * 2.0)
    fg2 = build_fast_graph(g2)
    assert not last_build_memo_hit(), (
        "memo returned stale scales for different degrees")
    s1 = np.asarray(fg1.dst_slot_scales["sym"])
    s2 = np.asarray(fg2.dst_slot_scales["sym"])
    assert not np.allclose(s1, s2)
    # and a true rebuild of the original hits
    fg3 = build_fast_graph(g)
    assert last_build_memo_hit()


def test_unit_mesh_elision_matches_literal(rng):
    """sharded@1 with elided collectives computes the same fwd+grads as
    with literal collectives."""
    from sir_gcn_tpu.parallel import make_mesh
    from sir_gcn_tpu.parallel.ell_distributed import (
        build_sharded_fast_graph,
        make_sharded_sir_aggregate_pallas,
    )

    n, e, h = 64, 512, 8
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    g = build_graph(src, dst, n, n_pad=64, e_pad=512)
    sfg = build_sharded_fast_graph(g, 1, agg_type="sym")
    mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
    xq = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)

    outs = []
    for elide in (False, True):
        f = make_sharded_sir_aggregate_pallas(
            sfg, jnp.tanh, mesh, interpret=True,
            elide_unit_collectives=elide)

        def loss(a, b):
            return jnp.sum(f(a, b) ** 2)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(xq, xq)
        outs.append((np.asarray(val), np.asarray(grads[0]),
                     np.asarray(grads[1])))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_halo_unit_mesh_elision_matches_literal(rng):
    from sir_gcn_tpu.parallel import make_mesh
    from sir_gcn_tpu.parallel.halo import (
        build_halo_fast_graph,
        make_halo_sir_aggregate,
    )

    n, e, h = 64, 512, 8
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    g = build_graph(src, dst, n, n_pad=64, e_pad=512)
    hfg = build_halo_fast_graph(g, 1, agg_type="sym")
    mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])
    xq = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)

    outs = []
    for elide in (False, True):
        f = make_halo_sir_aggregate(
            hfg, jnp.tanh, mesh, use_pallas=False,
            elide_unit_collectives=elide)

        def loss(a, b):
            return jnp.sum(f(a, b) ** 2)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(xq, xq)
        outs.append((np.asarray(val), np.asarray(grads[0]),
                     np.asarray(grads[1])))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(a, b, atol=1e-5)
