"""Smoke tests: every workload harness trains a few epochs end-to-end on
synthetic data (the reference's nine experiment dirs, SURVEY §2 rows
12-21)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_zinc():
    from experiments.zinc.train import main

    val, test = main(["--nhidden", "16", "--nlayers", "2", "--norm", "gn",
                      "--jumping-knowledge", "--epochs", "2", "--nruns",
                      "1", "--log-every", "100", "--synthetic-samples",
                      "100", "--batch-size", "32"])
    assert np.isfinite(test[0])


@pytest.mark.slow
def test_molhiv():
    from experiments.ogbg_molhiv.train import main

    val, test = main(["--nhidden", "16", "--nlayers", "1",
                      "--virtual-node", "--epochs", "2", "--nruns", "1",
                      "--log-every", "100", "--synthetic-samples", "100",
                      "--batch-size", "32"])
    assert np.isfinite(test[0])


@pytest.mark.slow
def test_sbm():
    from experiments.sbm.train import main

    val, test = main(["--nhidden", "16", "--nlayers", "1",
                      "--jumping-knowledge", "--epochs", "2", "--nruns",
                      "1", "--log-every", "100", "--synthetic-samples",
                      "60", "--batch-size", "32"])
    assert 0.0 <= test[0] <= 1.0


@pytest.mark.slow
def test_super_pixel():
    from experiments.super_pixel.train import main

    val, test = main(["--nhidden", "16", "--nlayers", "1",
                      "--use-feature", "--epochs", "2", "--nruns", "1",
                      "--log-every", "100", "--synthetic-samples", "80",
                      "--batch-size", "32"])
    assert 0.0 <= test[0] <= 1.0


@pytest.mark.slow
def test_wiki_cs():
    from experiments.wiki_cs.train import main

    val, test = main(["--nhidden", "16", "--nlayers", "1",
                      "--jumping-knowledge", "--epochs", "3", "--nruns",
                      "1", "--nsplits", "1", "--log-every", "100",
                      "--synthetic-nodes", "512", "--synthetic-edges",
                      "4096"])
    assert 0.0 <= test[0] <= 1.0


@pytest.mark.slow
def test_heterophilous_binary_and_multiclass():
    from experiments.heterophilous.train import main

    _, t1 = main(["--dataset", "minesweeper", "--nhidden", "32",
                  "--nlayers", "1", "--norm", "ln", "--residual",
                  "--use-amp", "--lr", "1e-3", "--epochs", "3",
                  "--nruns", "1", "--nsplits", "1", "--log-every", "100",
                  "--synthetic-nodes", "512", "--synthetic-edges",
                  "4096"])
    assert np.isfinite(t1[0])
    _, t2 = main(["--dataset", "roman-empire", "--nhidden", "32",
                  "--nlayers", "1", "--norm", "ln", "--lr", "1e-3",
                  "--epochs", "3", "--nruns", "1", "--nsplits", "1",
                  "--log-every", "100", "--synthetic-nodes", "512",
                  "--synthetic-edges", "4096"])
    assert 0.0 <= t2[0] <= 1.0


@pytest.mark.slow
def test_arxiv_correct_and_smooth(tmp_path, monkeypatch):
    import os

    monkeypatch.chdir(tmp_path)
    from experiments.ogbn_arxiv.correct_and_smooth import main as cs_main
    from experiments.ogbn_arxiv.train import main as arxiv_main

    arxiv_main(["--nhidden", "16", "--nlayers", "1", "--agg-type", "sym",
                "--add-reverse-edge", "--add-self-loop", "--epochs", "3",
                "--nruns", "1", "--log-every", "100", "--synthetic-nodes",
                "512", "--synthetic-edges", "4096", "--save-pred"])
    assert os.path.exists("./output/teacher_0.npy")
    results = cs_main(["--add-reverse-edge", "--add-self-loop",
                       "--use-sym", "--synthetic-nodes", "512",
                       "--synthetic-edges", "4096"])
    assert results and results[0]["test_acc"] >= results[0]["orig_test_acc"]


def test_arxiv_reorder_equivalence(tmp_path, monkeypatch):
    """--reorder (RCM relabeling) is equivariant: with dropout off, the
    saved predictions (mapped back to original node order) match the
    unreordered run up to reduction-order float noise."""
    import os

    import numpy as np

    from experiments.ogbn_arxiv.train import main as arxiv_main

    base = ["--nhidden", "16", "--nlayers", "1", "--agg-type", "sym",
            "--add-reverse-edge", "--epochs", "3", "--nruns", "1",
            "--log-every", "100", "--synthetic-nodes", "512",
            "--synthetic-edges", "4096", "--save-pred"]
    monkeypatch.chdir(tmp_path)
    os.makedirs("a"), os.makedirs("b")
    monkeypatch.chdir(tmp_path / "a")
    arxiv_main(base)
    monkeypatch.chdir(tmp_path / "b")
    arxiv_main(base + ["--reorder"])
    pa = np.load(tmp_path / "a" / "output" / "teacher_0.npy")
    pb = np.load(tmp_path / "b" / "output" / "teacher_0.npy")
    np.testing.assert_allclose(pa, pb, atol=5e-3)


@pytest.mark.slow
def test_molhiv_richer_variant_flags():
    """Richer commented-variant surface (reference ogbg-molhiv
    model.py:89-150): per-layer edge dropout, JK readouts, MLP residual,
    centrality encoder, self-loops, bond-feature conv."""
    from experiments.ogbg_molhiv.train import main

    val, test = main(["--nhidden", "16", "--nlayers", "2",
                      "--edge-dropout", "0.2", "--jumping-knowledge",
                      "--readout-layers", "2", "--residual",
                      "--resid-layers", "1", "--centrality-encoder",
                      "--add-self-loop", "--use-edge-feats",
                      "--epochs", "2", "--nruns", "1",
                      "--log-every", "100", "--synthetic-samples", "80",
                      "--batch-size", "32", "--gpu", "0"])
    assert np.isfinite(test[0])


@pytest.mark.slow
def test_sbm_gat_baseline():
    """GATv2 baseline on batched graphs (reference sbm model.py:55-92)."""
    from experiments.sbm.train import main

    val, test = main(["--model", "GAT", "--nheads", "2",
                      "--attn-dropout", "0.1", "--residual",
                      "--nhidden", "16", "--nlayers", "2",
                      "--epochs", "2", "--nruns", "1",
                      "--log-every", "100", "--synthetic-samples", "60",
                      "--batch-size", "32"])
    assert 0.0 <= test[0] <= 1.0


def test_step_time_telemetry(capsys):
    """Perf telemetry (VERDICT r2 item 9): the arxiv harness and a
    batched harness print a per-epoch step_time_ms line so model-layer
    perf regressions surface outside bench.py."""
    from experiments.ogbn_arxiv.train import main as arxiv_main

    arxiv_main(["--nhidden", "8", "--nlayers", "1", "--epochs", "2",
                "--nruns", "1", "--log-every", "100",
                "--synthetic-nodes", "256", "--synthetic-edges", "1024"])
    assert "step_time_ms:" in capsys.readouterr().out

    from experiments.zinc.train import main as zinc_main

    zinc_main(["--nhidden", "8", "--nlayers", "1", "--epochs", "1",
               "--nruns", "1", "--log-every", "100",
               "--synthetic-samples", "40", "--batch-size", "16"])
    assert "step_time_ms:" in capsys.readouterr().out
