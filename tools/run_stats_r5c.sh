#!/bin/bash
# Round-5 final-session lanes: one SEED per process (summary survives a
# round-end kill; a killed seed still leaves per-epoch lines for
# final-epoch reconstruction, as the GAT c=2 row was). All CPU — the TPU
# stays free for the driver's round-end bench. Seed start/end times are
# echoed to the lane .out so per-seed cost is measurable next time.
# Usage: bash tools/run_stats_r5c.sh gin|c6
set -u
cd "$(dirname "$0")/.."
mkdir -p stats10

HEC="nice -n 10 python experiments/hetero_edge_count/train.py --cpu \
    --nlayers 1 --nodes 50 --epochs 500 --batch-size 256 --lr 1e-3 \
    --factor 0.5 --patience 10 --nruns 1"

lane_gin() {
  for s in 0 1 2 3 4 5 6 7 8 9; do
    echo "[$(date -u +%H:%M:%S)] gin seed $s start"
    $HEC --model GIN --nhidden 20 --classes 2 --seed $s \
        > stats10/hec_gin_c2_s$s.log 2>&1
    echo "[$(date -u +%H:%M:%S)] gin seed $s done rc=$?"
  done
}

lane_c6() {
  for s in 0 1 2 3 4 5 6 7 8 9; do
    echo "[$(date -u +%H:%M:%S)] c6 seed $s start"
    $HEC --model SIR --nhidden 60 --classes 6 --seed $s \
        > stats10/hec_sir_c6_s$s.log 2>&1
    echo "[$(date -u +%H:%M:%S)] c6 seed $s done rc=$?"
  done
}

case "${1:-}" in
  gin) lane_gin ;;
  c6) lane_c6 ;;
  *) echo "usage: $0 gin|c6" >&2; exit 1 ;;
esac
