"""Whole-model NumPy oracles for the remaining L2 architectures
(VERDICT r1 item 3) — each model vs an independent NumPy implementation
of the reference equations:

* ogbn-arxiv EGC SIRModel (``benchmark-datasets/ogbn-arxiv/model.py:42-75``):
  linear embed -> N x [SIRConv(sym) + BatchNorm + LeakyReLU(0.2) +
  identity residual] -> linear readout, train-mode masked BN stats.
* heterophilous pre-norm SIRModel
  (``benchmark-datasets/heterophilous-datasets/model.py:35-55``):
  input linear + GELU(erf), blocks norm -> SIRConv -> GELU -> linear
  -> +resid, output norm + linear.
* ogbg-molhiv richer variant (``benchmark-datasets/ogbg-molhiv/
  model.py:89-150`` machinery + :50-86 EGC readout): AtomEncoder +
  CentralityEncoder + VirtualNode hooks + BN + EGC readout after pooling.
* wiki-cs-style GraphSIRModel (``benchmark-datasets/wiki-cs/model.py:12-50``):
  MLP residuals + jumping knowledge, node-level outputs
  (pool_after_readout=False).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from sir_gcn_tpu import batch_graphs, build_graph


def leaky(x):
    return np.where(x > 0, x, 0.2 * x)


def gelu_erf(x):
    return 0.5 * x * (1.0 + np.vectorize(math.erf)(x / np.sqrt(2.0)))


def lin(p, x):
    return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def sir_linear_agg(src, dst, n, eq, ek, act, agg, e=None):
    """sum/mean/sym SIR aggregation with the hoisted W_R left to the
    caller (models/conv.py:44-45,63-65)."""
    in_deg = np.bincount(dst, minlength=n).astype(np.float64)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    in_n = np.maximum(in_deg, 1) ** -0.5
    out_n = np.maximum(out_deg, 1) ** -0.5
    agg_out = np.zeros((n, eq.shape[1]))
    for idx, (s, d) in enumerate(zip(src, dst)):
        z = eq[d] + ek[s]
        if e is not None:
            z = z + e[idx]
        m = act(z)
        if agg == "sym":
            m = m * out_n[s] * in_n[d]
        agg_out[d] += m
    if agg == "mean":
        agg_out /= np.maximum(in_deg, 1)[:, None]
    return agg_out


def conv_out(c, src, dst, n, x, act, agg, e=None):
    """Full SIRConv: projections, aggregate, hoisted W_R."""
    eq = lin(c["linear_query"]["Dense_0"], x)
    ek = x @ np.asarray(c["linear_key"]["Dense_0"]["kernel"])
    agg_out = sir_linear_agg(src, dst, n, eq, ek, act, agg, e)
    return lin(c["linear_relation"]["Dense_0"], agg_out)


def masked_bn(p, x, mask, eps=1e-5):
    """Train-mode BatchNorm over valid rows only (biased variance for the
    normalization, torch semantics)."""
    m = mask.astype(np.float64)[:, None]
    cnt = max(m.sum(), 1.0)
    mean = (x * m).sum(0) / cnt
    var = (np.square(x - mean) * m).sum(0) / cnt
    return (np.asarray(p["weight"]) * (x - mean) / np.sqrt(var + eps)
            + np.asarray(p["bias"]))


def layer_norm(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = np.square(x - mean).mean(-1, keepdims=True)
    return (np.asarray(p["scale"]) * (x - mean) / np.sqrt(var + eps)
            + np.asarray(p["bias"]))


# ======================================================================
# ogbn-arxiv EGC model
# ======================================================================

def test_arxiv_egc_model_matches_numpy_reference(rng):
    from experiments.ogbn_arxiv.model import SIRModel

    n, e, fdim, hidden, cls, layers = 24, 96, 10, 12, 5, 2
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=32, e_pad=128)
    feats = np.zeros((32, fdim), np.float32)
    feats[:n] = rng.normal(size=(n, fdim))

    model = SIRModel(hidden_dim=hidden, output_dim=cls,
                     num_layers=layers, norm="bn", residual=True,
                     agg_type="sym")
    variables = model.init(jax.random.PRNGKey(0), g, jnp.asarray(feats))
    got, _ = model.apply(variables, g, jnp.asarray(feats),
                         deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    got = np.asarray(got)

    p = variables["params"]
    mask = np.zeros(32, bool)
    mask[:n] = True
    x = np.zeros((32, hidden))
    x[:] = lin(p["embedding"]["Dense_0"], feats)
    for i in range(layers):
        resid = x
        conv = conv_out(p[f"conv_{i}"], src, dst, 32, x, leaky, "sym")
        bname = [k for k in p if k.startswith("GraphBatchNorm")][i]
        h = masked_bn(p[bname]["MaskedBatchNorm_0"], conv, mask)
        x = leaky(h) + resid
    expected = lin(p["readout"]["Dense_0"], x)
    np.testing.assert_allclose(got[:n], expected[:n], atol=2e-3,
                               rtol=2e-3)


# ======================================================================
# heterophilous pre-norm model
# ======================================================================

def test_heterophilous_prenorm_model_matches_numpy_reference(rng):
    from experiments.heterophilous.model import SIRModel

    n, e, fdim, hidden, layers = 20, 80, 7, 10, 2
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=24, e_pad=96)
    feats = np.zeros((24, fdim), np.float32)
    feats[:n] = rng.normal(size=(n, fdim))

    model = SIRModel(hidden_dim=hidden, output_dim=1, num_layers=layers,
                     norm="ln", residual=True, agg_type="mean")
    variables = model.init(jax.random.PRNGKey(0), g, jnp.asarray(feats))
    got = np.asarray(model.apply(variables, g, jnp.asarray(feats)))

    p = variables["params"]
    x = gelu_erf(lin(p["input_linear"]["Dense_0"], feats))
    ln_names = [k for k in p if k.startswith("GraphLayerNorm")]
    for i in range(layers):
        resid = x
        h = layer_norm(p[ln_names[i]]["LayerNorm_0"]["LayerNorm_0"], x)
        h = conv_out(p[f"conv_{i}"], src, dst, 24, h, gelu_erf, "mean")
        h = gelu_erf(h)
        h = lin(p[f"linear_{i}"]["Dense_0"], h)
        x = h + resid
    x = layer_norm(p[ln_names[layers]]["LayerNorm_0"]["LayerNorm_0"], x)
    expected = lin(p["output_linear"]["Dense_0"], x)
    np.testing.assert_allclose(got[:n], expected[:n], atol=2e-3,
                               rtol=2e-3)


# ======================================================================
# ogbg-molhiv richer variant: VN + centrality + BN + EGC readout
# ======================================================================

def test_molhiv_vn_centrality_model_matches_numpy_reference(rng):
    from experiments.ogbg_molhiv.model import SIRModel
    from sir_gcn_tpu.models.encoders import ATOM_FEATURE_DIMS

    sizes = (6, 9, 5)
    hidden, layers, max_deg = 12, 2, 3
    graphs, feats = [], []
    for s in sizes:
        e = 3 * s
        graphs.append((rng.integers(0, s, e), rng.integers(0, s, e), s))
        feats.append(np.stack(
            [rng.integers(0, min(card, 4), s)
             for card in ATOM_FEATURE_DIMS], axis=1))
    gb = batch_graphs(graphs, n_pad=24, e_pad=96, g_pad=4)
    nfeats = np.zeros((24, len(ATOM_FEATURE_DIMS)), np.int32)
    nfeats[: sum(sizes)] = np.concatenate(feats)

    model = SIRModel(hidden_dim=hidden, output_dim=1, num_layers=layers,
                     norm="bn", residual=True, agg_type="sum",
                     virtual_node=True, vn_layers=1, max_degree=max_deg,
                     readout_pooling="mean")
    variables = model.init(jax.random.PRNGKey(0), gb,
                           jnp.asarray(nfeats))
    got, _ = model.apply(variables, gb, jnp.asarray(nfeats),
                         deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])
    got = np.asarray(got)

    # ---- NumPy reference over the unpadded batch ----
    p = variables["params"]
    n = sum(sizes)
    gid = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])
    src_all, dst_all, off = [], [], 0
    for (s, d, sz) in graphs:
        src_all.extend((np.asarray(s) + off).tolist())
        dst_all.extend((np.asarray(d) + off).tolist())
        off += sz
    src_all = np.asarray(src_all)
    dst_all = np.asarray(dst_all)

    x = np.zeros((n, hidden))
    for i in range(len(ATOM_FEATURE_DIMS)):
        emb = np.asarray(p["embedding"][f"embedding_{i}"]["embedding"])
        x += emb[np.concatenate(feats)[:, i]]
    # centrality: in-degree clamped to max_degree, padding_idx 0
    in_deg = np.bincount(dst_all, minlength=n)
    cemb = np.asarray(p["centrality"]["encoder_in"]["embedding"])
    x = x + cemb[np.minimum(in_deg, max_deg)]

    mask_n = np.ones(n, bool)
    vnfeat = None
    for i in range(layers):
        # vn.node_emb: add current VN embedding (init from Embed(1, h))
        if vnfeat is None:
            vnfeat = np.broadcast_to(
                np.asarray(p["vn"]["init_emb"]["embedding"])[0],
                (len(sizes), hidden)).copy()
        x = x + vnfeat[gid]
        resid = x
        conv = conv_out(p[f"conv_{i}"], src_all, dst_all, n, x, leaky,
                        "sum")
        bname = [k for k in p if k.startswith("GraphBatchNorm")][i]
        h = masked_bn(p[bname]["MaskedBatchNorm_0"], conv, mask_n)
        x = leaky(h) + resid
        if i < layers - 1:
            # vn.vn_emb: sum-pool + prev VN state -> 1-layer MLP
            pooled = np.stack([x[gid == gi].sum(0)
                               for gi in range(len(sizes))]) + vnfeat
            r = p["vn_mlp"]["linear_0"]["Dense_0"]
            vnfeat = lin(r, pooled)

    pooled = np.stack([x[gid == gi].mean(0)
                       for gi in range(len(sizes))])
    # EGC readout: linear -> BN(graph mask) -> leaky -> ... -> linear
    ro = p["readout"]
    mask_g = np.ones(len(sizes), bool)
    h = lin(ro["linear_0"]["Dense_0"], pooled)
    h = leaky(masked_bn(ro["norm_0"], h, mask_g))
    h = lin(ro["linear_1"]["Dense_0"], h)
    h = leaky(masked_bn(ro["norm_1"], h, mask_g))
    expected = lin(ro["linear_2"]["Dense_0"], h)
    np.testing.assert_allclose(got[: len(sizes)], expected, atol=2e-3,
                               rtol=2e-3)


# ======================================================================
# wiki-cs-style GraphSIRModel: MLP residual + JK, node-level outputs
# ======================================================================

def test_wikics_style_model_matches_numpy_reference(rng):
    from experiments.common_models import GraphSIRModel

    n, e, fdim, hidden, cls, layers = 18, 72, 8, 10, 4, 2
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = build_graph(src, dst, n, n_pad=24, e_pad=96)
    feats = np.zeros((24, fdim), np.float32)
    feats[:n] = rng.normal(size=(n, fdim))

    model = GraphSIRModel(
        encoder=lambda mdl, f: f, hidden_dim=hidden, output_dim=cls,
        num_layers=layers, norm="none", jumping_knowledge=True,
        residual=True, resid_layers=1, agg_type="mean",
        readout_layers=1, pool_after_readout=False,
    )
    # hidden != fdim: first conv maps fdim -> hidden; JK head 0 sees fdim
    variables = model.init(jax.random.PRNGKey(0), g, jnp.asarray(feats))
    got = np.asarray(model.apply(variables, g, jnp.asarray(feats)))

    p = variables["params"]
    x = feats.copy()
    xs = [x]
    for i in range(layers):
        resid = lin(p[f"resid_{i}"]["linear_0"]["Dense_0"], x)
        x = conv_out(p[f"conv_{i}"], src, dst, 24, x, leaky, "mean")
        x = leaky(x + resid)
        xs.append(x)
    expected = np.zeros((24, cls))
    for i, h in enumerate(xs):
        expected += lin(p[f"readout_{i}"]["linear_0"]["Dense_0"], h)
    np.testing.assert_allclose(got[:n], expected[:n], atol=2e-3,
                               rtol=2e-3)
