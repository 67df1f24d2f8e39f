"""End-to-end model parity: GraphSIRModel (the shared batched task model)
vs an independent NumPy implementation of the reference's ZINC
architecture equations (``benchmark-datasets/zinc/model.py:18-61``:
embedding -> N x [SIRConv + identity residual + GraphNorm + LeakyReLU(0.2)]
-> jumping-knowledge readouts summed per node -> SumPooling). This is the
BASELINE.md north-star "per-layer activation allclose vs the reference
equation" gate at the whole-model level."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from experiments.common_models import GraphSIRModel
from sir_gcn_tpu import batch_graphs
from sir_gcn_tpu.models import Embed


def leaky(x):
    return np.where(x > 0, x, 0.2 * x)


def numpy_reference(params, src, dst, sizes, feats_int, hidden, nlayers):
    """The reference equations, straight from models/conv.py + norm.py +
    zinc/model.py, in NumPy over the unpadded batch."""
    p = params["params"]
    n = sum(sizes)
    x = np.asarray(p["node_encoder"]["embedding"])[feats_int]

    # graph ids
    gid = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])

    xs = [x]
    for i in range(nlayers):
        c = p[f"conv_{i}"]
        wq = np.asarray(c["linear_query"]["Dense_0"]["kernel"])
        bq = np.asarray(c["linear_query"]["Dense_0"]["bias"])
        wk = np.asarray(c["linear_key"]["Dense_0"]["kernel"])
        wr = np.asarray(c["linear_relation"]["Dense_0"]["kernel"])
        br = np.asarray(c["linear_relation"]["Dense_0"]["bias"])
        eq = x @ wq + bq
        ek = x @ wk
        agg = np.zeros((n, hidden))
        for s, d in zip(src, dst):
            agg[d] += leaky(eq[d] + ek[s])        # conv.py:45 (sum agg)
        conv = agg @ wr + br                      # conv.py:65 hoisted W_R
        x2 = conv + x                             # identity residual

        # GraphNorm (norm.py:15-29); flax auto-names the in-loop modules
        gname = [k for k in p if k.startswith("GraphNorm")][i]
        gn = p[gname]
        weight = np.asarray(gn["weight"])
        bias = np.asarray(gn["bias"])
        mean_scale = np.asarray(gn["mean_scale"])
        out = np.zeros_like(x2)
        for gi in range(len(sizes)):
            rows = x2[gid == gi]
            mean = rows.mean(0)
            demean = rows - mean * mean_scale
            std = np.sqrt((demean ** 2).mean(0) + 1e-5)
            out[gid == gi] = weight * demean / std + bias
        x = leaky(out)
        xs.append(x)

    # jumping-knowledge: per-head single-linear readouts, summed
    score = np.zeros((n, 1))
    for i, h in enumerate(xs):
        r = p[f"readout_{i}"]["linear_0"]["Dense_0"]
        score += h @ np.asarray(r["kernel"]) + np.asarray(r["bias"])

    # SumPooling
    pooled = np.zeros((len(sizes), 1))
    for gi in range(len(sizes)):
        pooled[gi] = score[gid == gi].sum(0)
    return pooled


def test_graph_sir_model_matches_numpy_reference(rng):
    sizes = (7, 11, 5)
    hidden, nlayers, vocab = 16, 2, 9
    graphs, feats = [], []
    for s in sizes:
        e = 3 * s
        graphs.append((rng.integers(0, s, e), rng.integers(0, s, e), s))
        feats.append(rng.integers(0, vocab, s))
    gb = batch_graphs(graphs, n_pad=32, e_pad=128, g_pad=4)
    feats_full = np.concatenate(feats)
    feats_pad = np.zeros(32, np.int32)
    feats_pad[: len(feats_full)] = feats_full

    model = GraphSIRModel(
        encoder=lambda mdl, f: Embed(vocab, hidden,
                                     name="node_encoder")(f),
        hidden_dim=hidden, output_dim=1, num_layers=nlayers,
        norm="gn", jumping_knowledge=True, residual=True,
        agg_type="sum", readout_pooling="sum",
    )
    params = model.init(jax.random.PRNGKey(0), gb,
                        jnp.asarray(feats_pad))
    got = np.asarray(model.apply(params, gb, jnp.asarray(feats_pad)))

    # global edge list with batch offsets
    src_all, dst_all, off = [], [], 0
    for (s, d, n) in graphs:
        src_all.extend((np.asarray(s) + off).tolist())
        dst_all.extend((np.asarray(d) + off).tolist())
        off += n
    expected = numpy_reference(params, src_all, dst_all, sizes,
                               feats_full, hidden, nlayers)
    np.testing.assert_allclose(got[: len(sizes)], expected,
                               atol=2e-3, rtol=2e-3)
