"""Norm zoo tests vs NumPy oracles of the reference math
(models/norm.py:7-50)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import batch_graphs
from sir_gcn_tpu.models import (
    ContraNorm,
    GraphNorm,
    MaskedBatchNorm,
    get_norm,
)


def make_batch(rng, sizes=(3, 5, 2), n_pad=16):
    graphs = []
    for n in sizes:
        e = max(1, n)
        graphs.append((rng.integers(0, n, e), rng.integers(0, n, e), n))
    return batch_graphs(graphs, n_pad=n_pad, e_pad=32, g_pad=4)


def test_graphnorm_matches_oracle(rng):
    sizes = (3, 5, 2)
    g = make_batch(rng, sizes)
    feats = rng.normal(size=(16, 4)).astype(np.float32)
    gn = GraphNorm(dim=4)
    params = gn.init(jax.random.PRNGKey(0), g, jnp.asarray(feats))
    out = np.asarray(gn.apply(params, g, jnp.asarray(feats)))

    # oracle: per-graph stats with weight=1, bias=0, mean_scale=1
    start = 0
    for n in sizes:
        x = feats[start:start + n]
        mean = x.mean(0)
        demean = x - mean
        std = np.sqrt((demean ** 2).mean(0) + 1e-5)
        np.testing.assert_allclose(
            out[start:start + n], demean / std, atol=1e-5
        )
        start += n


def test_graphnorm_ignores_padding(rng):
    g = make_batch(rng)
    feats = rng.normal(size=(16, 4)).astype(np.float32)
    feats2 = feats.copy()
    feats2[10:] = 99.0  # clobber padding rows
    gn = GraphNorm(dim=4)
    params = gn.init(jax.random.PRNGKey(0), g, jnp.asarray(feats))
    o1 = np.asarray(gn.apply(params, g, jnp.asarray(feats)))[:10]
    o2 = np.asarray(gn.apply(params, g, jnp.asarray(feats2)))[:10]
    np.testing.assert_allclose(o1, o2, atol=1e-6)


def test_masked_batchnorm_train_eval(rng):
    feats = rng.normal(loc=3.0, scale=2.0, size=(32, 4)).astype(np.float32)
    mask = np.ones(32, bool)
    mask[20:] = False
    bn = MaskedBatchNorm(dim=4)
    vs = bn.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask))
    out, updates = bn.apply(
        vs, jnp.asarray(feats), jnp.asarray(mask),
        deterministic=False, mutable=["batch_stats"],
    )
    out = np.asarray(out)
    # real rows are standardized w.r.t. masked stats
    real = feats[:20]
    mean, var = real.mean(0), real.var(0)
    np.testing.assert_allclose(
        out[:20], (real - mean) / np.sqrt(var + 1e-5), atol=1e-4
    )
    # running stats updated toward batch stats (momentum 0.1, unbiased var)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]), 0.1 * mean, atol=1e-5
    )
    # eval mode uses running stats
    vs2 = {"params": vs["params"], "batch_stats": updates["batch_stats"]}
    out_eval = bn.apply(vs2, jnp.asarray(feats), jnp.asarray(mask),
                        deterministic=True)
    assert np.isfinite(np.asarray(out_eval)).all()


def test_contranorm_oracle(rng):
    feats = rng.normal(size=(12, 4)).astype(np.float32)
    cn = ContraNorm(dim=4, scale=0.5, temp=1.0, use_scale=True)
    vs = cn.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    out, _ = cn.apply(vs, jnp.asarray(feats), deterministic=False,
                      mutable=["batch_stats"])

    # oracle (reference models/norm.py:40-45)
    def softmax(z, axis):
        z = z - z.max(axis=axis, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=axis, keepdims=True)

    w = softmax(feats.T @ feats, 1)
    x = (1 + 0.5) * feats - 0.5 * (feats @ w)
    x = (x - x.mean(0)) / np.sqrt(x.var(0) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_get_norm_factory(rng):
    g = make_batch(rng)
    feats = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    for name in ["gn", "cn", "bn", "ln", "none"]:
        norm = get_norm(name, True, 4)
        vs = norm.init(jax.random.PRNGKey(0), g, feats)
        out = norm.apply(vs, g, feats, mutable=["batch_stats"])[0] \
            if name in ("cn", "bn") else norm.apply(vs, g, feats)
        assert out.shape == feats.shape
    for name in ["cn", "bn", "ln", "none"]:
        norm = get_norm(name, False, 4)
        vs = norm.init(jax.random.PRNGKey(0), feats)
        assert vs is not None
    with pytest.raises(NotImplementedError):
        get_norm("gn", False, 4)
    with pytest.raises(NotImplementedError):
        get_norm("foo", True, 4)


def test_pooling(rng):
    from sir_gcn_tpu.ops import avg_pool, sum_pool

    sizes = (3, 5, 2)
    g = make_batch(rng, sizes)
    feats = rng.normal(size=(16, 4)).astype(np.float32)
    s = np.asarray(sum_pool(g, jnp.asarray(feats)))
    a = np.asarray(avg_pool(g, jnp.asarray(feats)))
    start = 0
    for i, n in enumerate(sizes):
        np.testing.assert_allclose(s[i], feats[start:start + n].sum(0),
                                   atol=1e-5)
        np.testing.assert_allclose(a[i], feats[start:start + n].mean(0),
                                   atol=1e-5)
        start += n
