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


def _arxiv_cache(cache_dir, rng, n=50, e=200, feat_dim=16):
    np.savez(cache_dir / "ogbn_arxiv.npz",
             src=rng.integers(0, n, e), dst=rng.integers(0, n, e),
             feat=rng.normal(size=(n, feat_dim)).astype(np.float32),
             labels=rng.integers(0, 5, n),
             train_idx=np.arange(30), val_idx=np.arange(30, 40),
             test_idx=np.arange(40, 50))
    return n


def test_arxiv_cache_through_harness(cache_dir, capsys, tmp_path,
                                     monkeypatch):
    """ogbn-arxiv npz (+ GIANT-XRT .npy, reference train.py:48-50) loaded
    through the real harness path — no synthetic-fallback warning."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    n = _arxiv_cache(cache_dir, rng)
    # GIANT-XRT replacement embeddings, consumed relative to the cwd
    import os

    os.makedirs("dataset/ogbn_arxiv_xrt", exist_ok=True)
    np.save("dataset/ogbn_arxiv_xrt/X.all.xrt-emb.npy",
            rng.normal(size=(n, 24)).astype(np.float32))
    from experiments.ogbn_arxiv.train import main

    val, test = main(["--nhidden", "8", "--nlayers", "1", "--epochs", "2",
                      "--nruns", "1", "--use-xrt-emb",
                      "--log-every", "100"])
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(test[0])


def test_wiki_cs_cache(cache_dir, capsys):
    """wiki-cs split-mask layout (convert_datasets.py:44-53), incl. the
    val+stopping merge (reference wiki-cs/train.py:44)."""
    rng = np.random.default_rng(1)
    n, e, S = 40, 160, 20
    tr = rng.random((S, n)) < 0.3
    va = rng.random((S, n)) < 0.2
    stp = rng.random((S, n)) < 0.2
    te = rng.random(n) < 0.3
    np.savez(cache_dir / "wiki_cs.npz",
             src=rng.integers(0, n, e), dst=rng.integers(0, n, e),
             feat=rng.normal(size=(n, 12)).astype(np.float32),
             labels=rng.integers(0, 5, n),
             train_masks=tr, val_masks=va, stopping_masks=stp,
             test_mask=te)
    from experiments.wiki_cs.train import load_wiki, main

    got = load_wiki(None, 0, 3)
    assert got[-1] is False  # not synthetic
    np.testing.assert_array_equal(got[4], tr[3])
    np.testing.assert_array_equal(got[5], va[3] | stp[3])  # merge
    np.testing.assert_array_equal(got[6], te)

    val, test = main(["--nhidden", "8", "--nlayers", "1", "--epochs", "1",
                      "--nruns", "1", "--nsplits", "2",
                      "--log-every", "100"])
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(test).all() and len(test) == 2


def test_heterophilous_cache(cache_dir, capsys):
    """Heterophilous 10-split mask layout (convert_datasets.py:55-75),
    binary dataset -> BCE + ROC-AUC route."""
    rng = np.random.default_rng(2)
    n, e, S = 40, 160, 10
    np.savez(cache_dir / "minesweeper.npz",
             src=rng.integers(0, n, e), dst=rng.integers(0, n, e),
             feat=rng.normal(size=(n, 7)).astype(np.float32),
             labels=rng.integers(0, 2, n),
             train_masks=rng.random((S, n)) < 0.5,
             val_masks=rng.random((S, n)) < 0.25,
             test_masks=rng.random((S, n)) < 0.25)
    from experiments.heterophilous.train import main

    val, test = main(["--dataset", "minesweeper", "--nhidden", "8",
                      "--nlayers", "1", "--epochs", "1", "--nruns", "1",
                      "--nsplits", "2", "--log-every", "100"])
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(test).all() and len(test) == 2


def test_molhiv_cache(cache_dir, capsys):
    """ogbg-molhiv graph pack with 9-column atom / 3-column bond int
    features (convert_datasets.py:118-131)."""
    from sir_gcn_tpu.models.encoders import (
        ATOM_FEATURE_DIMS,
        BOND_FEATURE_DIMS,
    )

    rng = np.random.default_rng(3)
    S = 24
    offs_n, offs_e = [0], [0]
    srcs, dsts, nfs, efs = [], [], [], []
    for _ in range(S):
        n = int(rng.integers(4, 9))
        e = 2 * n
        srcs.append(rng.integers(0, n, e))
        dsts.append(rng.integers(0, n, e))
        nfs.append(np.stack([rng.integers(0, c, n)
                             for c in ATOM_FEATURE_DIMS], 1))
        efs.append(np.stack([rng.integers(0, c, e)
                             for c in BOND_FEATURE_DIMS], 1))
        offs_n.append(offs_n[-1] + n)
        offs_e.append(offs_e[-1] + e)
    idx = np.arange(S)
    np.savez(cache_dir / "ogbg_molhiv.npz",
             src=np.concatenate(srcs), dst=np.concatenate(dsts),
             node_feat=np.concatenate(nfs), edge_feat=np.concatenate(efs),
             labels=rng.integers(0, 2, S).astype(np.float32),
             offsets_nodes=np.asarray(offs_n),
             offsets_edges=np.asarray(offs_e),
             train_idx=idx[:16], val_idx=idx[16:20], test_idx=idx[20:])
    from experiments.ogbg_molhiv.train import main

    val, test = main(["--nhidden", "8", "--nlayers", "1", "--epochs", "1",
                      "--nruns", "1", "--batch-size", "8",
                      "--log-every", "100"])
    out = capsys.readouterr().out
    assert "synthetic stand-in" not in out
    assert np.isfinite(test[0])
