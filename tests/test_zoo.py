"""Baseline conv zoo + utility module tests (segment_softmax, GATv2, GCN,
GIN, SAGE, PNA, VirtualNode, CentralityEncoder, MLP)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sir_gcn_tpu import batch_graphs, build_graph
from sir_gcn_tpu.models import MLP, CentralityEncoder, VirtualNode
from sir_gcn_tpu.models.zoo import (
    GATv2Conv,
    GINConv,
    GINEConv,
    GraphConv,
    PNAConv,
    SAGEConv,
)
from sir_gcn_tpu.ops.segment import segment_softmax


def make_graph(rng, n=12, e=40):
    return (build_graph(rng.integers(0, n, e), rng.integers(0, n, e), n,
                        n_pad=16, e_pad=64),
            None)


def test_segment_softmax(rng):
    n, e = 6, 20
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=8, e_pad=32)
    logits = rng.normal(size=(32,)).astype(np.float32)
    alpha = np.asarray(segment_softmax(
        jnp.asarray(logits), g.dst, 8, g.edge_mask))
    d = np.asarray(g.dst)
    em = np.asarray(g.edge_mask)
    # per-dst valid alphas sum to 1; invalid alphas are 0
    for u in range(n):
        sel = (d == u) & em
        if sel.any():
            np.testing.assert_allclose(alpha[sel].sum(), 1.0, rtol=1e-5)
    assert np.allclose(alpha[~em], 0.0)


def test_graphconv_oracle(rng):
    n, e = 10, 30
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=16, e_pad=32)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    conv = GraphConv(3)
    params = conv.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    out = np.asarray(conv.apply(params, g, jnp.asarray(x)))

    w = np.asarray(params["params"]["weight"]["Dense_0"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    ideg = np.maximum(np.bincount(dst, minlength=n), 1)
    odeg = np.maximum(np.bincount(src, minlength=n), 1)
    exp = np.zeros((n, 3))
    for s, d in zip(src, dst):
        exp[d] += (x[s] / np.sqrt(odeg[s])) @ w / np.sqrt(ideg[d])
    exp += b
    np.testing.assert_allclose(out[:n], exp, atol=1e-4)


def test_gatv2_attention_is_convex_combination(rng):
    g, _ = make_graph(rng)
    x = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
    conv = GATv2Conv(8, num_heads=2)
    params = conv.init(jax.random.PRNGKey(0), g, x)
    out = conv.apply(params, g, x)
    assert out.shape == (16, 2, 8)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("cls,kw", [
    (GINConv, dict(apply_func=lambda h: h * 2.0)),
    (SAGEConv, dict(features=8)),
    (PNAConv, dict(features=8)),
])
def test_zoo_convs_run_and_grad(rng, cls, kw):
    g, _ = make_graph(rng)
    x = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    conv = cls(**kw)
    params = conv.init(jax.random.PRNGKey(0), g, x)

    def loss(p, x):
        return jnp.sum(conv.apply(p, g, x) ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(grads))


def test_gine_uses_edge_features(rng):
    g, _ = make_graph(rng)
    x = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    e1 = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    conv = GINEConv(apply_func=lambda h: h)
    params = conv.init(jax.random.PRNGKey(0), g, x, e1)
    o1 = conv.apply(params, g, x, e1)
    o2 = conv.apply(params, g, x, e1 + 1.0)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_virtual_node_roundtrip(rng):
    gb = batch_graphs([(np.array([0, 1]), np.array([1, 0]), 3)] * 2,
                      n_pad=8, e_pad=8, g_pad=3)
    x = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            vn = VirtualNode(
                True, 4, residual=True,
                mod_emb=MLP(4, 4, 4, 1, 0.0, "none", jax.nn.relu,
                            include_last=False, with_graph=True,
                            name="vnmlp"),
                name="vn")
            x2, vnf = vn.node_emb(g, x, None)
            vnf = vn.vn_emb(g, x2, vnf)
            x3, _ = vn.node_emb(g, x2, vnf)
            return x3

    w = Wrap()
    params = w.init(jax.random.PRNGKey(0), gb, x)
    out = w.apply(params, gb, x)
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(out), np.asarray(x))

    # use_vn=False is a no-op
    class Off(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            vn = VirtualNode(False, 4, residual=False, name="vn")
            x2, vnf = vn.node_emb(g, x, None)
            assert vnf is None
            return x2

    off = Off()
    p2 = off.init(jax.random.PRNGKey(0), gb, x)
    np.testing.assert_allclose(np.asarray(off.apply(p2, gb, x)),
                               np.asarray(x))


def test_centrality_encoder(rng):
    g, _ = make_graph(rng)
    x = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
    enc = CentralityEncoder(max_degree=4, embedding_dim=6)
    params = enc.init(jax.random.PRNGKey(0), g, x)
    out = enc.apply(params, g, x)
    assert not np.allclose(np.asarray(out), np.asarray(x))
    # max_degree=0 => identity
    enc0 = CentralityEncoder(max_degree=0, embedding_dim=6)
    p0 = enc0.init(jax.random.PRNGKey(0), g, x)
    np.testing.assert_allclose(np.asarray(enc0.apply(p0, g, x)),
                               np.asarray(x))


def test_mlp_include_last_and_signatures(rng):
    x = jnp.asarray(rng.normal(size=(10, 5)), jnp.float32)
    # include_last=False: final layer has no norm/activation => can be
    # negative even with relu
    m = MLP(5, 8, 3, 2, 0.0, "none", jax.nn.relu, include_last=False,
            with_graph=False)
    p = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(p, x))
    assert out.shape == (10, 3) and (out < 0).any()

    m2 = MLP(5, 8, 3, 2, 0.0, "none", jax.nn.relu, include_last=True,
             with_graph=False)
    p2 = m2.init(jax.random.PRNGKey(1), x)
    assert (np.asarray(m2.apply(p2, x)) >= 0).all()

    # zero layers: identity (+ trailing dropout) — reference MLP semantics
    m0 = MLP(5, 8, 3, 0, 0.0, "none", jax.nn.relu, with_graph=False)
    p0 = m0.init(jax.random.PRNGKey(2), x)
    np.testing.assert_allclose(np.asarray(m0.apply(p0, x)), np.asarray(x))


def test_pna_full_surface_oracle(rng):
    """PNAConv with towers=2, all aggregators, all scalers vs a NumPy
    oracle of DGL PNAConv's equations (Corso et al.)."""
    n, e, f = 10, 36, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=16, e_pad=48)
    feat = rng.normal(size=(16, f)).astype(np.float32)
    delta = 1.3

    conv = PNAConv(features=8,
                   aggregators=("mean", "max", "min", "std", "var", "sum"),
                   scalers=("identity", "amplification", "attenuation"),
                   num_towers=2, delta=delta)
    params = conv.init(jax.random.PRNGKey(0), g, jnp.asarray(feat))
    out = np.asarray(conv.apply(params, g, jnp.asarray(feat)))

    # numpy oracle
    p = params["params"]
    in_deg = np.zeros(16)
    np.add.at(in_deg, dst, 1.0)
    logd = np.log(np.maximum(in_deg, 1.0) + 1.0)
    outs = []
    for t in range(2):
        sl = slice(t * f // 2, (t + 1) * f // 2)
        dm = p[f"M_{t}"]["Dense_0"]
        wm, bm = np.asarray(dm["kernel"]), np.asarray(dm["bias"])
        m = np.concatenate([feat[dst][:, sl], feat[src][:, sl]], -1) @ wm \
            + bm
        aggs = {k: np.zeros((16, f // 2), np.float32)
                for k in ("sum", "sq")}
        mx = np.full((16, f // 2), -np.inf, np.float32)
        mn = np.full((16, f // 2), np.inf, np.float32)
        for i in range(e):
            aggs["sum"][dst[i]] += m[i]
            aggs["sq"][dst[i]] += m[i] ** 2
            mx[dst[i]] = np.maximum(mx[dst[i]], m[i])
            mn[dst[i]] = np.minimum(mn[dst[i]], m[i])
        cnt = np.maximum(in_deg, 1.0)[:, None]
        mean = aggs["sum"] / cnt
        var = np.maximum(aggs["sq"] / cnt - mean ** 2, 0.0)
        std = np.sqrt(var + 1e-10)
        mx[np.isinf(mx)] = 0.0  # framework zero-fills empty maxes
        mn[np.isinf(mn)] = 0.0
        parts = [feat[:, sl]]
        for a in (mean, mx, mn, std, var, aggs["sum"]):
            parts += [a, a * (logd[:, None] / delta),
                      a * (delta / logd[:, None])]
        du = p[f"U_{t}"]["Dense_0"]
        wu, bu = np.asarray(du["kernel"]), np.asarray(du["bias"])
        outs.append(np.concatenate(parts, -1) @ wu + bu)
    dmix = p["mixing"]["Dense_0"]
    wmix, bmix = np.asarray(dmix["kernel"]), np.asarray(dmix["bias"])
    expected = np.concatenate(outs, -1) @ wmix + bmix
    np.testing.assert_allclose(out[:n], expected[:n], atol=2e-4, rtol=1e-3)


def test_pna_delta():
    from sir_gcn_tpu.models import pna_delta

    d = pna_delta([np.array([1.0, 3.0]), np.array([0.0])])
    expected = np.mean(np.log([2.0, 4.0, 2.0]))
    np.testing.assert_allclose(d, expected, rtol=1e-6)


def test_segment_softmax_grads_finite_with_empty_segments(rng):
    """Regression: zero-in-degree nodes / all-invalid padding segments used
    to poison the VJP (seg_max = finfo.min is finite, exp overflowed to inf
    forward-masked to 0, and inf * 0 = NaN in backward) — which silently
    NaN'd every GAT training run on graphs with isolated nodes."""
    n, e = 6, 10
    src = rng.integers(0, 3, e)   # nodes 3..5 have no in-edges
    dst = rng.integers(0, 3, e)
    g = build_graph(src, dst, n, n_pad=8, e_pad=32)  # padding segment too
    logits = jnp.asarray(rng.normal(size=(32,)), jnp.float32)

    def loss(lg):
        return jnp.sum(segment_softmax(lg, g.dst, 8, g.edge_mask) ** 2)

    grad = jax.grad(loss)(logits)
    assert bool(jnp.isfinite(grad).all())


def test_gatv2_training_grads_finite_isolated_nodes(rng):
    """End-to-end: GATv2Conv gradients stay finite when some nodes have
    zero in-degree (the arxiv reverse-edges graph shape)."""
    n, e = 10, 20
    src = rng.integers(0, 5, e)
    dst = rng.integers(0, 5, e)
    g = build_graph(src, dst, n, n_pad=16, e_pad=32)
    x = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    conv = GATv2Conv(3, num_heads=2, residual=True, attn_dropout=0.1)
    params = conv.init(jax.random.PRNGKey(0), g, x)

    def loss(p, x):
        out = conv.apply(p, g, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    leaves = jax.tree_util.tree_leaves(gp) + [gx]
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
