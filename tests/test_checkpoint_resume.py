"""Checkpoint/resume (orbax) on the arxiv harness: a run interrupted at a
checkpoint and resumed must match an uninterrupted run bitwise (train
state, plateau scheduler scalars, best-selection, and both RNG streams
are restored/fast-forwarded)."""

import numpy as np


COMMON = ["--nhidden", "12", "--nlayers", "2", "--epochs", "4",
          "--nruns", "1", "--log-every", "100",
          "--synthetic-nodes", "400", "--synthetic-edges", "2000"]


def test_arxiv_checkpoint_resume_bitwise(tmp_path):
    from experiments.ogbn_arxiv.train import main

    val_a, test_a = main(list(COMMON))

    ck = ["--ckpt-dir", str(tmp_path / "ck"), "--ckpt-every", "2"]
    # phase 1: stop after epoch 2 (checkpoint saved at epoch 2)
    main([a if a != "4" else "2" for a in COMMON] + ck)
    # phase 2: resume to epoch 4
    val_b, test_b = main(list(COMMON) + ck + ["--resume"])

    assert test_b[0] == test_a[0]
    assert val_b[0] == val_a[0]


def test_arxiv_resume_past_end_returns_best(tmp_path):
    from experiments.ogbn_arxiv.train import main

    ck = ["--ckpt-dir", str(tmp_path / "ck"), "--ckpt-every", "2"]
    val_a, test_a = main(list(COMMON) + ck)
    # resuming with the same epoch budget: loop is skipped entirely and
    # the checkpointed best is reported
    val_b, test_b = main(list(COMMON) + ck + ["--resume"])
    assert np.isfinite(test_b[0])
