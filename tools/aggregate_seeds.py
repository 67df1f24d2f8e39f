"""Aggregate per-seed stat-lane logs into a protocol mean +- std row.

The per-seed lanes (tools/run_stats_r5b/c/d.sh) run ONE seed per
process, each log ending with the harness's ``test MSE: [x]`` /
``Average test ...`` lines (sir_gcn_tpu/train/engine.py:97-102 —
np.mean / np.std ddof=0, the reference's convention). This collects the
per-seed values across logs and prints the combined row, plus
final-epoch reconstructions for seeds that were killed mid-run.

Usage: python tools/aggregate_seeds.py stats10/hec_gin_c2_s*.log
"""
import re
import sys

import numpy as np


def last_value(path):
    """(value, kind): a completed seed's test MSE, else final-epoch test_loss."""
    done, partial = None, None
    with open(path, errors="replace") as f:
        for line in f:
            m = re.match(r"test MSE: \[([0-9eE+.\-, ]+)\]", line)
            if m:
                done = [float(v) for v in m.group(1).split(",")]
            m = re.search(r"test_loss: ([0-9eE+.\-]+)", line)
            if m:
                partial = float(m.group(1))
    if done is not None:
        return done, "complete"
    return ([partial] if partial is not None else []), "partial(final-epoch)"


def main(paths):
    complete, partials = [], []
    for p in paths:
        vals, kind = last_value(p)
        for v in vals:
            (complete if kind == "complete" else partials).append(v)
        print(f"{p}: {kind} {vals}")
    if complete:
        print(f"complete seeds (n={len(complete)}): "
              f"{np.mean(complete):.6f} ± {np.std(complete):.6f}")
    if partials:
        both = complete + partials
        print(f"with final-epoch partials (n={len(both)}): "
              f"{np.mean(both):.6f} ± {np.std(both):.6f}")


if __name__ == "__main__":
    main(sys.argv[1:])
