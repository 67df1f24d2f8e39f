#!/bin/bash
# Round-5 final-session lane continuation: same per-seed protocol as
# run_stats_r5c.sh, but every python launch is gated on
# /tmp/sir_tpu.lock (CLAUDE.md: a new interpreter can wedge an active
# TPU job) and the lane first waits for an already-in-flight seed
# process to exit. Usage:
#   bash tools/run_stats_r5d.sh gin <wait_pid> <first_seed>
#   bash tools/run_stats_r5d.sh c6  <wait_pid> <first_seed>
set -u
cd "$(dirname "$0")/.."
mkdir -p stats10

wait_tpu() { while [ -e /tmp/sir_tpu.lock ]; do sleep 20; done; }
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 20; done; }

HEC="nice -n 10 python experiments/hetero_edge_count/train.py --cpu \
    --nlayers 1 --nodes 50 --epochs 500 --batch-size 256 --lr 1e-3 \
    --factor 0.5 --patience 10 --nruns 1"

MODE="${1:?gin|c6}"; PREV="${2:-0}"; FIRST="${3:-1}"
[ "$PREV" != "0" ] && { echo "[$(date -u +%H:%M:%S)] waiting on pid $PREV"; wait_pid "$PREV"; }

for s in $(seq "$FIRST" 9); do
  wait_tpu
  echo "[$(date -u +%H:%M:%S)] $MODE seed $s start"
  case "$MODE" in
    gin) $HEC --model GIN --nhidden 20 --classes 2 --seed $s \
             > stats10/hec_gin_c2_s$s.log 2>&1 ;;
    c6)  $HEC --model SIR --nhidden 60 --classes 6 --seed $s \
             > stats10/hec_sir_c6_s$s.log 2>&1 ;;
  esac
  echo "[$(date -u +%H:%M:%S)] $MODE seed $s done rc=$?"
done
