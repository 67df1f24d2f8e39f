"""Drill tools/convert_datasets.py against stub dgl/ogb modules
(VERDICT r4 item 3: the converters gate real-dataset parity and had
never executed — an attr-name bug would surface only on dataset day).

Stub modules expose exactly the API surface the converters touch
(FakeGraph.edges()/ndata/edata/num_nodes/num_edges, dataset classes,
OGB get_idx_split) with torch tensors, mirroring DGL 2.1/OGB 1.3
(reference requirements.txt:1-6). Every converter runs, and each npz is
then loaded through the REAL harness load path into a training smoke
step — the same code that will read the real caches.
"""

import sys
import types

import numpy as np
import pytest
import torch

from tools.convert_datasets import CONVERTERS

RNG = np.random.default_rng(0)


class FakeGraph:
    """The slice of dgl.DGLGraph the converters consume."""

    def __init__(self, n, src, dst, ndata=None, edata=None):
        self._n = int(n)
        self._src = torch.as_tensor(np.asarray(src), dtype=torch.int64)
        self._dst = torch.as_tensor(np.asarray(dst), dtype=torch.int64)
        self.ndata = {k: torch.as_tensor(v) for k, v in (ndata or {}).items()}
        self.edata = {k: torch.as_tensor(v) for k, v in (edata or {}).items()}

    def edges(self):
        return self._src, self._dst

    def num_nodes(self):
        return self._n

    def num_edges(self):
        return int(self._src.shape[0])


def _toy_graph(n, e, ndata=None, edata=None):
    return FakeGraph(n, RNG.integers(0, n, e), RNG.integers(0, n, e),
                     ndata, edata)


def _node_ds_graph(n, feat_dim, classes, nsplits):
    masks = RNG.random((n, nsplits)) if nsplits else None
    nd = {
        "feat": RNG.normal(size=(n, feat_dim)).astype(np.float32),
        "label": RNG.integers(0, classes, n),
    }
    if nsplits:
        nd["train_mask"] = masks < 0.5
        nd["val_mask"] = (masks >= 0.5) & (masks < 0.75)
        nd["test_mask"] = masks >= 0.75
    return _toy_graph(n, 4 * n, ndata=nd)


def _mol_items(num, node_feat_cols, edge_feat_cols, int_feats=True):
    """(graph, y) pairs with per-graph node/edge features."""
    out = []
    for _ in range(num):
        n = int(RNG.integers(3, 8))
        e = 2 * n
        if int_feats:
            nf = RNG.integers(0, 5, (n, node_feat_cols) if node_feat_cols
                              else n)
            ef = RNG.integers(0, 3, (e, edge_feat_cols) if edge_feat_cols
                              else e)
        else:
            nf = RNG.random((n, node_feat_cols)).astype(np.float32)
            ef = RNG.random((e, edge_feat_cols)).astype(np.float32)
        g = _toy_graph(n, e, ndata={"feat": nf}, edata={"feat": ef})
        out.append((g, torch.tensor(float(RNG.random()))))
    return out


@pytest.fixture
def stub_modules(monkeypatch):
    """Install fake dgl / ogb packages into sys.modules."""
    # ---- dgl.data ------------------------------------------------------
    dgl_data = types.ModuleType("dgl.data")

    class WikiCSDataset:
        def __getitem__(self, i):
            g = _node_ds_graph(60, 300, 10, nsplits=20)
            g.ndata["stopping_mask"] = g.ndata["val_mask"].clone()
            g.ndata["test_mask"] = torch.as_tensor(RNG.random(60) > 0.5)
            return g

    def _hetero_cls(classes):
        class _DS:
            def __getitem__(self, i):
                return _node_ds_graph(50, 16, classes, nsplits=10)
        return _DS

    class ZINCDataset:
        def __init__(self, mode):
            assert mode in ("train", "valid", "test")
            self.items = _mol_items(12 if mode == "train" else 6,
                                    0, 0, int_feats=True)

        def __iter__(self):
            return iter(self.items)

    def _sbm_cls(classes, maxfeat):
        class _DS:
            def __init__(self, mode):
                assert mode in ("train", "valid", "test")
                self.gs = []
                for _ in range(10 if mode == "train" else 4):
                    n = int(RNG.integers(8, 16))
                    self.gs.append(_toy_graph(n, 3 * n, ndata={
                        "feat": RNG.integers(0, maxfeat + 1, n),
                        "label": RNG.integers(0, classes, n)}))

            def __iter__(self):
                return iter(self.gs)

            def __len__(self):
                return len(self.gs)
        return _DS

    def _superpixel_cls(n_train):
        class _DS:
            def __init__(self, split, use_feature):
                assert split in ("train", "test") and use_feature
                num = n_train if split == "train" else 20
                self.items = _mol_items(num, 3, 1, int_feats=False)

            def __iter__(self):
                return iter(self.items)

            def __len__(self):
                return len(self.items)
        return _DS

    dgl_data.WikiCSDataset = WikiCSDataset
    dgl_data.RomanEmpireDataset = _hetero_cls(18)
    dgl_data.AmazonRatingsDataset = _hetero_cls(5)
    dgl_data.MinesweeperDataset = _hetero_cls(2)
    dgl_data.TolokersDataset = _hetero_cls(2)
    dgl_data.QuestionsDataset = _hetero_cls(2)
    dgl_data.ZINCDataset = ZINCDataset
    dgl_data.PATTERNDataset = _sbm_cls(2, 2)
    dgl_data.CLUSTERDataset = _sbm_cls(6, 6)
    # >5000 train graphs so the converter's real first-5k-as-val split
    # (reference super-pixel train.py:48-49) is exercised verbatim
    dgl_data.MNISTSuperPixelDataset = _superpixel_cls(5010)
    dgl_data.CIFAR10SuperPixelDataset = _superpixel_cls(5010)

    dgl = types.ModuleType("dgl")
    dgl.data = dgl_data

    # ---- ogb -----------------------------------------------------------
    ogb = types.ModuleType("ogb")
    nodeproppred = types.ModuleType("ogb.nodeproppred")
    graphproppred = types.ModuleType("ogb.graphproppred")

    class DglNodePropPredDataset:
        def __init__(self, name):
            assert name == "ogbn-arxiv"
            self.n = 80

        def __getitem__(self, i):
            g = _toy_graph(self.n, 5 * self.n, ndata={
                "feat": RNG.normal(size=(self.n, 128)).astype(np.float32)})
            labels = torch.as_tensor(RNG.integers(0, 40, (self.n, 1)))
            return g, labels

        def get_idx_split(self):
            perm = torch.randperm(self.n)
            return {"train": perm[:48], "valid": perm[48:64],
                    "test": perm[64:]}

    class DglGraphPropPredDataset:
        def __init__(self, name):
            assert name == "ogbg-molhiv"
            self.items = _mol_items(40, 9, 3, int_feats=True)
            # binary classification labels
            for i, (g, _) in enumerate(self.items):
                self.items[i] = (g, torch.tensor(float(i % 2)))

        def __iter__(self):
            return iter(self.items)

        def get_idx_split(self):
            idx = torch.arange(len(self.items))
            return {"train": idx[:32], "valid": idx[32:36],
                    "test": idx[36:]}

    nodeproppred.DglNodePropPredDataset = DglNodePropPredDataset
    graphproppred.DglGraphPropPredDataset = DglGraphPropPredDataset
    ogb.nodeproppred = nodeproppred
    ogb.graphproppred = graphproppred

    for name, mod in [("dgl", dgl), ("dgl.data", dgl_data), ("ogb", ogb),
                      ("ogb.nodeproppred", nodeproppred),
                      ("ogb.graphproppred", graphproppred)]:
        monkeypatch.setitem(sys.modules, name, mod)


@pytest.fixture
def converted(stub_modules, tmp_path, monkeypatch):
    """Run EVERY converter, then point the loaders at the output dir."""
    out = tmp_path / "datasets"
    out.mkdir()
    for name, fn in CONVERTERS.items():
        fn(str(out))
    import sir_gcn_tpu.data.loaders as loaders

    monkeypatch.setattr(loaders, "DATA_ROOT", str(out))
    return out


def test_all_converters_produce_loadable_npz(converted):
    """Every CONVERTERS entry writes an npz the documented layout
    (loaders.py docstring) can read."""
    from sir_gcn_tpu.data.loaders import has_cache

    expected = {
        "ogbn-arxiv": "ogbn_arxiv", "wiki-cs": "wiki_cs", "zinc": "zinc",
        "ogbg-molhiv": "ogbg_molhiv", "roman-empire": "roman_empire",
        "amazon-ratings": "amazon_ratings", "minesweeper": "minesweeper",
        "tolokers": "tolokers", "questions": "questions",
        "sbm-pattern": "sbm_pattern", "sbm-cluster": "sbm_cluster",
        "superpixel-mnist": "superpixel_mnist",
        "superpixel-cifar10": "superpixel_cifar10",
    }
    assert set(expected) == set(CONVERTERS)
    for cache_name in expected.values():
        assert has_cache(cache_name), cache_name
        z = np.load(converted / f"{cache_name}.npz")
        assert z["src"].shape == z["dst"].shape
        if "offsets_nodes" in z:  # graph-property layout
            on, oe = z["offsets_nodes"], z["offsets_edges"]
            assert on[0] == 0 and oe[0] == 0
            assert z["node_feat"].shape[0] == on[-1]
            assert z["src"].shape[0] == oe[-1]
            # graph-local edge ids: every edge < its graph's node count
            sizes = np.diff(on)
            counts = np.diff(oe)
            gid = np.repeat(np.arange(len(sizes)), counts)
            assert (z["src"] < sizes[gid]).all()
            assert (z["dst"] < sizes[gid]).all()
        else:  # node-classification layout
            assert z["feat"].shape[0] >= z["labels"].shape[0]


def test_arxiv_cache_through_loader_and_harness(converted):
    from sir_gcn_tpu.data.loaders import load_node_classification

    d = load_node_classification("ogbn-arxiv")
    assert not d.synthetic and d.num_classes == 40
    assert d.feat.shape == (80, 128)
    from experiments.ogbn_arxiv.train import main

    accs = main(["--nhidden", "16", "--nlayers", "1", "--epochs", "2",
                 "--nruns", "1", "--log-every", "100"])
    assert np.isfinite(accs[-1][0] if hasattr(accs[-1], "__len__")
                       else accs[-1])


def test_wiki_cs_cache_through_harness(converted, capsys):
    from experiments.wiki_cs.train import main

    val, test = main(["--nhidden", "8", "--nlayers", "1", "--epochs", "2",
                      "--nruns", "1", "--nsplits", "1",
                      "--log-every", "100"])
    assert "synthetic" not in capsys.readouterr().out
    assert 0.0 <= test[0] <= 1.0


def test_heterophilous_caches_through_harness(converted, capsys):
    from experiments.heterophilous.train import NUM_SPLITS, main

    # all five npz files load through the harness path; train one
    for name in ("roman-empire", "amazon-ratings", "minesweeper",
                 "tolokers", "questions"):
        z = np.load(converted / f"{name.replace('-', '_')}.npz")
        assert z["train_masks"].shape[0] == NUM_SPLITS  # [S, N] after .T
        assert z["train_masks"].shape[1] == z["labels"].shape[0]
    val, test = main(["--dataset", "minesweeper", "--nhidden", "8",
                      "--nlayers", "1", "--epochs", "2", "--nruns", "1",
                      "--nsplits", "1", "--log-every", "100"])
    assert "synthetic" not in capsys.readouterr().out
    assert np.isfinite(test[0])


def test_zinc_cache_through_harness(converted, capsys):
    from experiments.zinc.train import main

    val, test = main(["--nhidden", "8", "--nlayers", "1", "--epochs", "2",
                      "--nruns", "1", "--batch-size", "8",
                      "--log-every", "100"])
    assert "synthetic" not in capsys.readouterr().out
    assert np.isfinite(test[0])


def test_molhiv_cache_through_harness(converted, capsys):
    from experiments.ogbg_molhiv.train import main

    val, test = main(["--nhidden", "8", "--nlayers", "1", "--epochs", "2",
                      "--nruns", "1", "--batch-size", "8",
                      "--log-every", "100"])
    assert "synthetic" not in capsys.readouterr().out
    assert np.isfinite(test[0])


def test_sbm_caches_through_harness(converted, capsys):
    from experiments.sbm.train import load_cached, main

    graphs, nfeats, nlabels, (tr, va, te) = load_cached("sbm-cluster")
    assert len(graphs) == len(nfeats) == len(nlabels) == 18
    assert len(tr) == 10 and len(va) == 4 and len(te) == 4
    val, test = main(["--dataset", "PATTERN", "--nhidden", "8",
                      "--nlayers", "1", "--epochs", "2", "--nruns", "1",
                      "--batch-size", "8", "--log-every", "100"])
    assert "synthetic" not in capsys.readouterr().out
    assert 0.0 <= test[0] <= 1.0


def test_superpixel_caches_through_harness(converted, capsys):
    z = np.load(converted / "superpixel_cifar10.npz")
    # first-5k-of-train-as-val split semantics survive conversion
    assert len(z["val_idx"]) == 5000
    assert len(z["train_idx"]) == 10
    assert len(z["test_idx"]) == 20
    assert not np.intersect1d(z["val_idx"], z["train_idx"]).size
    from experiments.super_pixel.train import main

    val, test = main(["--dataset", "MNIST", "--use-feature", "--nhidden",
                      "8", "--nlayers", "1", "--epochs", "1", "--nruns",
                      "1", "--batch-size", "256", "--log-every", "100"])
    assert "synthetic" not in capsys.readouterr().out
    assert 0.0 <= test[0] <= 1.0
