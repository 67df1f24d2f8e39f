"""Dataset cache loading: write tiny npz caches in the converter layouts
and check every harness loads them (no synthetic-fallback warning path)."""

import os

import numpy as np
import pytest


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    import sir_gcn_tpu.data.loaders as loaders

    monkeypatch.setattr(loaders, "DATA_ROOT", str(tmp_path))
    return tmp_path


def _graph_pack(num_graphs, rng, nf_dim=None, ef_dim=None, node_labels=False,
                nf_int=False):
    offs_n, offs_e = [0], [0]
    srcs, dsts, nfs, efs, nls = [], [], [], [], []
    for _ in range(num_graphs):
        n = int(rng.integers(4, 8))
        e = 2 * n
        srcs.append(rng.integers(0, n, e))
        dsts.append(rng.integers(0, n, e))
        if nf_int:
            nfs.append(rng.integers(0, 3, (n,)))
        elif nf_dim:
            nfs.append(rng.normal(size=(n, nf_dim)).astype(np.float32))
        if ef_dim is not None:
            efs.append(rng.integers(0, 3, (e,) if ef_dim == 0
                                    else (e, ef_dim)))
        if node_labels:
            nls.append(rng.integers(0, 2, n))
        offs_n.append(offs_n[-1] + n)
        offs_e.append(offs_e[-1] + e)
    out = dict(
        src=np.concatenate(srcs), dst=np.concatenate(dsts),
        offsets_nodes=np.asarray(offs_n), offsets_edges=np.asarray(offs_e),
        node_feat=np.concatenate(nfs),
    )
    if efs:
        out["edge_feat"] = np.concatenate(efs)
    if nls:
        out["node_label"] = np.concatenate(nls)
    return out


def test_zinc_cache(cache_dir):
    rng = np.random.default_rng(0)
    S = 30
    pack = _graph_pack(S, rng, nf_int=True, ef_dim=0)
    idx = np.arange(S)
    np.savez(cache_dir / "zinc.npz", **pack,
             labels=rng.normal(size=S).astype(np.float32),
             train_idx=idx[:20], val_idx=idx[20:25], test_idx=idx[25:])
    from experiments.zinc.train import main

    val, test = main(["--nhidden", "8", "--nlayers", "1", "--epochs", "1",
                      "--nruns", "1", "--batch-size", "16",
                      "--log-every", "100"])
    assert np.isfinite(test[0])


def test_sbm_cache(cache_dir):
    rng = np.random.default_rng(0)
    S = 24
    pack = _graph_pack(S, rng, nf_int=True, node_labels=True)
    idx = np.arange(S)
    np.savez(cache_dir / "sbm_pattern.npz", **pack,
             train_idx=idx[:16], val_idx=idx[16:20], test_idx=idx[20:])
    from experiments.sbm.train import main

    val, test = main(["--nhidden", "8", "--nlayers", "1", "--epochs", "1",
                      "--nruns", "1", "--batch-size", "8",
                      "--log-every", "100"])
    assert 0 <= test[0] <= 1


def test_superpixel_cache(cache_dir):
    rng = np.random.default_rng(0)
    S = 24
    pack = _graph_pack(S, rng, nf_dim=3)
    idx = np.arange(S)
    np.savez(cache_dir / "superpixel_mnist.npz", **pack,
             labels=rng.integers(0, 10, S),
             train_idx=idx[:16], val_idx=idx[16:20], test_idx=idx[20:])
    from experiments.super_pixel.train import main

    val, test = main(["--nhidden", "8", "--nlayers", "1", "--epochs", "1",
                      "--nruns", "1", "--batch-size", "8",
                      "--log-every", "100"])
    assert 0 <= test[0] <= 1


def test_node_classification_cache(cache_dir):
    rng = np.random.default_rng(0)
    n, e = 50, 200
    np.savez(cache_dir / "ogbn_arxiv.npz",
             src=rng.integers(0, n, e), dst=rng.integers(0, n, e),
             feat=rng.normal(size=(n, 16)).astype(np.float32),
             labels=rng.integers(0, 5, n),
             train_idx=np.arange(30), val_idx=np.arange(30, 40),
             test_idx=np.arange(40, 50))
    from sir_gcn_tpu.data.loaders import load_node_classification

    d = load_node_classification("ogbn-arxiv")
    assert not d.synthetic
    assert d.num_classes == 5 and d.feat.shape == (50, 16)
