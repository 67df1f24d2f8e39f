"""Data parallelism over batched-graph workloads (SURVEY §2c P1).

Each device trains on its own padded :class:`GraphBatch` (graph structure is
per-device data, not parameters), gradients are psum'd over the ``data``
mesh axis riding ICI. Implemented with ``shard_map`` so per-device graphs
keep *local* node ids — no cross-device gathers in the hot path at all.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def stack_device_batches(batches: list) -> object:
    """Stack per-device batch pytrees (e.g. dicts of arrays + GraphBatch)
    along a new leading device axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches
    )


def _unstack(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def make_dp_train_step(
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    data_axis: str = "data",
):
    """Build a jitted data-parallel train step.

    ``loss_fn(params, batch, rng) -> scalar loss`` runs unchanged on each
    device's local batch; gradients and loss are psum-averaged over
    ``data_axis``. Params/opt state are replicated.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis), P(data_axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _step(params, opt_state, batch, rng):
        local = _unstack(batch)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, local, rng[0]
        )
        loss = jax.lax.pmean(loss, data_axis)
        grads = jax.lax.pmean(grads, data_axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(_step)


def make_dp_train_step_stateful(
    loss_fn: Callable,
    tx,
    mesh: Mesh,
    data_axis: str = "data",
):
    """Data-parallel train step that also carries mutable model state
    (BatchNorm ``batch_stats``): ``loss_fn(params, batch_stats, batch,
    rng) -> (loss, new_batch_stats)``. Gradients, loss AND the updated
    batch statistics are pmean-synced over ``data_axis`` (the standard
    cross-replica BatchNorm treatment)."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(data_axis), P(data_axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def _step(params, opt_state, batch_stats, batch, rng):
        local = _unstack(batch)
        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, local, rng[0]
        )
        loss = jax.lax.pmean(loss, data_axis)
        grads = jax.lax.pmean(grads, data_axis)
        bs = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, data_axis), bs)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, bs, loss

    return jax.jit(_step)


def device_put_replicated(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
