"""arxiv harness feature-path coverage: label trick + label reuse + FLAG +
mask-rate + KD in one short run (the reference's bag of tricks,
``benchmark-datasets/ogbn-arxiv/train.py:93-145``)."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_arxiv_label_trick_flag_kd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from experiments.ogbn_arxiv.train import main

    common = ["--nhidden", "16", "--nlayers", "1", "--use-labels",
              "--label-iters", "1", "--mask-rate", "0.5", "--flag",
              "--m", "2", "--epochs", "3", "--nruns", "1",
              "--log-every", "100", "--synthetic-nodes", "512",
              "--synthetic-edges", "4096"]
    # teacher run saves predictions
    val, test = main(common + ["--save-pred"])
    assert np.isfinite(test[0])
    assert os.path.exists("./output/teacher_0.npy")
    # student run consumes them through the KD loss
    val, test = main(common + ["--kd-mode", "student"])
    assert np.isfinite(test[0])
