"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest sets
xla_force_host_platform_device_count=8): GSPMD edge-partitioned full-graph
and shard_map data parallelism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sir_gcn_tpu import build_graph
from sir_gcn_tpu.ops import sir_aggregate
from sir_gcn_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    shard_full_graph,
    stack_device_batches,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_full_graph_sharded_matches_single_device(rng):
    n, e = 256, 2048
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=256, e_pad=2048)
    eq = jnp.asarray(rng.normal(size=(256, 16)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(256, 16)), jnp.float32)

    expected = sir_aggregate(g, eq, ek, jnp.tanh, "sym")

    mesh = make_mesh((8,), ("graph",))
    gs = shard_full_graph(g, mesh)
    node_sh = NamedSharding(mesh, P("graph"))
    eq_s = jax.device_put(eq, node_sh)
    ek_s = jax.device_put(ek, node_sh)

    @jax.jit
    def f(graph, eq, ek):
        return sir_aggregate(graph, eq, ek, jnp.tanh, "sym")

    got = f(gs, eq_s, ek_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)
    # output is actually row-sharded over the mesh
    assert len(got.sharding.device_set) == 8


def test_full_graph_sharded_grad(rng):
    n, e = 128, 512
    g = build_graph(rng.integers(0, n, e), rng.integers(0, n, e), n,
                    n_pad=128, e_pad=512)
    x = jnp.asarray(rng.normal(size=(128, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)

    def loss(w, graph, x):
        out = sir_aggregate(graph, x @ w, x @ w, jnp.tanh, "sum")
        return jnp.sum(out ** 2)

    expected = jax.grad(loss)(w, g, x)

    mesh = make_mesh((8,), ("graph",))
    gs = shard_full_graph(g, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("graph")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    got = jax.jit(jax.grad(loss))(ws, gs, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=1e-4)


def test_data_parallel_step(rng):
    """8-way dp over batched graphs: replicated params, psum'd grads."""
    import optax

    from sir_gcn_tpu import batch_graphs
    from sir_gcn_tpu.models import SIRConv
    from sir_gcn_tpu.ops import sum_pool

    import flax.linen as nn

    class TinyModel(nn.Module):
        @nn.compact
        def __call__(self, graph, x):
            h = SIRConv(8, 8, jnp.tanh)(graph, x)
            from sir_gcn_tpu.models import Linear
            return sum_pool(graph, Linear(1)(h))

    model = TinyModel()

    def make_batch(seed):
        r = np.random.default_rng(seed)
        gs = [(r.integers(0, 5, 8), r.integers(0, 5, 8), 5)
              for _ in range(4)]
        gb = batch_graphs(gs, n_pad=24, e_pad=32, g_pad=5)
        x = jnp.asarray(r.normal(size=(24, 8)), jnp.float32)
        y = jnp.asarray(r.normal(size=(5,)), jnp.float32)
        return {"graph": gb, "x": x, "y": y}

    batches = [make_batch(s) for s in range(8)]
    stacked = stack_device_batches(batches)

    b0 = batches[0]
    params = model.init(jax.random.PRNGKey(0), b0["graph"], b0["x"])["params"]

    def loss_fn(params, batch, rng):
        pred = model.apply({"params": params}, batch["graph"], batch["x"])
        return jnp.mean((pred[:, 0] - batch["y"]) ** 2)

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    mesh = make_mesh((8,), ("data",))
    step = make_dp_train_step(loss_fn, tx, mesh)

    rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(8)])
    new_params, new_opt, loss = step(params, opt_state, stacked, rngs)
    assert np.isfinite(float(loss))

    # psum'd grads must equal the mean of per-device grads
    gmean = jax.tree_util.tree_map(
        lambda *g: sum(g) / 8,
        *[jax.grad(loss_fn)(params, b, None) for b in batches],
    )
    manual_updates, _ = tx.update(gmean, tx.init(params), params)
    manual = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                    manual_updates)
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_arxiv_mesh_devices_matches_single_device():
    """--mesh-devices (edge-partitioned full-graph training from the
    harness CLI, SURVEY §2c P2) matches the single-device CSR path —
    both the GSPMD-partitioned CSR and the boundary-only halo paths."""
    from experiments.ogbn_arxiv.train import main

    common = ["--epochs", "2", "--nruns", "1", "--nhidden", "12",
              "--nlayers", "2", "--log-every", "100",
              "--synthetic-nodes", "1000", "--synthetic-edges", "6000"]
    val_1, test_1 = main(common + ["--no-fast-path"])
    for path in ("gspmd", "halo"):
        val_8, test_8 = main(common + ["--mesh-devices", "8",
                                       "--dist-path", path])
        assert abs(test_8[0] - test_1[0]) < 1e-6, path
        assert abs(val_8[0] - val_1[0]) < 1e-6, path


def test_zinc_dp_devices_trains():
    """--dp-devices on a batched harness (SURVEY §2c P1 from the CLI):
    per-device batches, psum'd grads, pmean'd BatchNorm stats."""
    from experiments.zinc.train import main

    val, test = main(["--dp-devices", "4", "--epochs", "2", "--nruns",
                      "1", "--nhidden", "12", "--nlayers", "1",
                      "--norm", "bn", "--synthetic-samples", "80",
                      "--batch-size", "8", "--log-every", "100"])
    assert np.isfinite(test[0])


def test_wikics_mesh_devices_matches_single_device():
    """--mesh-devices on the shared fullgraph harness (wiki-cs): the halo
    fast path through the model layer matches single-device."""
    from experiments.wiki_cs.train import main

    common = ["--epochs", "2", "--nruns", "1", "--nsplits", "1",
              "--nhidden", "12", "--nlayers", "2", "--agg-type", "mean",
              "--log-every", "100", "--synthetic-nodes", "1000",
              "--synthetic-edges", "6000"]
    val_1, test_1 = main(common + ["--no-fast-path"])
    val_8, test_8 = main(common + ["--mesh-devices", "8"])
    assert abs(test_8[0] - test_1[0]) < 1e-6
    assert abs(val_8[0] - val_1[0]) < 1e-6
