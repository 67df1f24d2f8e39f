"""End-to-end oracles (SURVEY §4): DictionaryLookup must reach 100% test
accuracy — the known-exact-solution probe that distinguishes SIR-GCN from
chance-level GCN (reference README.md:43-74)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_dictionary_lookup_reaches_perfect_accuracy():
    from experiments.dictionary_lookup.train import main

    train_accs, test_accs = main([
        "--nodes", "5", "--samples", "240", "--nhidden", "32",
        "--epochs", "120", "--batch-size", "64", "--nruns", "1",
        "--log-every", "1000",
    ])
    assert test_accs[0] == 1.0, f"expected 1.0, got {test_accs[0]}"


@pytest.mark.slow
def test_hetero_edge_count_learns():
    from experiments.hetero_edge_count.train import main

    losses, test_losses = main([
        "--nodes", "8", "--classes", "2", "--nhidden", "32",
        "--samples", "300", "--epochs", "60", "--batch-size", "64",
        "--nruns", "1", "--log-every", "1000", "--normalize",
    ])
    # must be clearly below the variance of the target (~0.08 for c=2)
    assert test_losses[0] < 0.04, test_losses


def test_gcn_baseline_fails_dictionary_lookup():
    """The discriminative-power contrast: GCN stays near chance (1/n)."""
    from experiments.dictionary_lookup.train import main

    _, test_accs = main([
        "--nodes", "5", "--samples", "160", "--nhidden", "16",
        "--epochs", "15", "--batch-size", "64", "--nruns", "1",
        "--model", "GCN", "--log-every", "1000",
    ])
    assert test_accs[0] < 0.7


@pytest.mark.parametrize("model", ["GCN", "GAT", "SAGE", "GIN", "PNA"])
def test_hetero_edge_count_baselines_run(model):
    """Every baseline in the reference's hetero-edge-count README table
    must run through the harness with its README flags (a GCNModel
    kwarg mismatch once broke `--model GCN` — round 4)."""
    from experiments.hetero_edge_count.train import main

    losses, test_losses = main([
        "--nodes", "6", "--classes", "2", "--nhidden", "8",
        "--samples", "60", "--epochs", "2", "--batch-size", "32",
        "--nruns", "1", "--model", model, "--nheads", "1",
        "--log-every", "1000",
    ])
    assert np.isfinite(test_losses[0])
