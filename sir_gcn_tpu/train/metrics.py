"""Evaluation metrics used across the nine reference workloads (SURVEY §5):
accuracy, balanced accuracy (SBM), MAE (ZINC), MSE (hetero-edge-count),
ROC-AUC (molhiv / heterophilous-binary — dependency-free implementation of
the rank-statistic AUC, replacing OGB Evaluator / sklearn)."""

from __future__ import annotations

import numpy as np


def accuracy(logits: np.ndarray, labels: np.ndarray) -> float:
    return float(np.mean(np.argmax(logits, -1) == labels))


def balanced_accuracy(logits: np.ndarray, labels: np.ndarray,
                      num_classes: int) -> float:
    """Class-balanced accuracy (reference
    ``benchmark-datasets/sbm-dataset/train.py:58-61``: mean of per-class
    recall over classes present in the labels)."""
    pred = np.argmax(logits, -1)
    accs = []
    for c in range(num_classes):
        m = labels == c
        if m.any():
            accs.append(float(np.mean(pred[m] == c)))
    return float(np.mean(accs))


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Binary ROC-AUC via the Mann-Whitney U statistic (tie-aware midranks),
    numerically identical to sklearn.metrics.roc_auc_score."""
    scores = np.asarray(scores, np.float64).ravel()
    labels = np.asarray(labels).ravel().astype(bool)
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    sorted_scores = scores[order]
    # midranks for ties
    i = 0
    r = np.arange(1, scores.size + 1, dtype=np.float64)
    while i < scores.size:
        j = i
        while j + 1 < scores.size and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        r[i:j + 1] = 0.5 * (i + j) + 1.0
        i = j + 1
    ranks[order] = r
    auc = (ranks[labels].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return float(auc)


def mae(pred: np.ndarray, target: np.ndarray) -> float:
    return float(np.mean(np.abs(pred - target)))


def mse(pred: np.ndarray, target: np.ndarray) -> float:
    return float(np.mean((pred - target) ** 2))
