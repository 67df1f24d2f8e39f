#!/bin/bash
# Round-5 late-session lanes, one SEED per process so every completed
# seed prints its own summary (the 10-seeds-per-process form loses all
# results if the lane is stopped mid-run — learned when the GAT lane was
# killed at the 8h mark during seed 5). All CPU: the TPU stays free for
# the driver's round-end bench. Aggregate with:
#   grep -H "Average test" stats10/hec_*_s?.log
set -u
cd "$(dirname "$0")/.."
mkdir -p stats10

HEC="nice -n 10 python experiments/hetero_edge_count/train.py --cpu \
    --nlayers 1 --nodes 50 --epochs 500 --batch-size 256 --lr 1e-3 \
    --factor 0.5 --patience 10 --nruns 1"

lane_gin() {
  for s in 0 1 2 3 4 5 6 7 8 9; do
    $HEC --model GIN --nhidden 20 --classes 2 --seed $s \
        > stats10/hec_gin_c2_s$s.log 2>&1
  done
}

lane_gat() {  # seeds 0-3 already done at protocol in hec_gat_c2.log
  for s in 4 5 6 7 8 9; do
    $HEC --model GAT --nhidden 20 --classes 2 --nheads 1 --seed $s \
        > stats10/hec_gat_c2_s$s.log 2>&1
  done
}

lane_c6() {
  for s in 0 1 2 3 4 5 6 7 8 9; do
    $HEC --model SIR --nhidden 60 --classes 6 --seed $s \
        > stats10/hec_sir_c6_s$s.log 2>&1
  done
}

case "${1:-}" in
  gin) lane_gin ;;
  gat) lane_gat ;;
  c6) lane_c6 ;;
  *) echo "usage: $0 gin|gat|c6" >&2; exit 1 ;;
esac
