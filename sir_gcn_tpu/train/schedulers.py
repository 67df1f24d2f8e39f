"""LR schedule utilities mirroring the reference harness semantics:
linear warmup (``benchmark-datasets/ogbn-arxiv/train.py:27-30``) and
torch-style ReduceLROnPlateau (``train.py:180``, torch defaults:
threshold 1e-4 relative, cooldown 0)."""

from __future__ import annotations


def warmup_scale(epoch: int, warmup: int) -> float:
    """Linear warmup multiplier for epoch (1-indexed like the reference)."""
    if warmup <= 0:
        return 1.0
    return min(1.0, epoch / warmup)


class ReduceLROnPlateau:
    """Host-side plateau scheduler producing an LR *scale* factor.

    Matches ``torch.optim.lr_scheduler.ReduceLROnPlateau`` (mode='min',
    threshold_mode='rel') as used by every reference ``run`` loop.
    """

    def __init__(self, factor: float = 0.5, patience: int = 10,
                 threshold: float = 1e-4, min_scale: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_scale = min_scale
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.num_bad = 0
        return self.scale
