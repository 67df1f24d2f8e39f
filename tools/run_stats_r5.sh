#!/bin/bash
# Round-5 statistics lanes (VERDICT r4 item 4): the remaining
# hetero-edge-count grid rows at the reference's full protocol
# (README command verbatim: --nhidden 10c, 500 epochs, batch 256,
# lr 1e-3, plateau 0.5/10, nruns 10).
#
# Each python launch is gated on /tmp/sir_tpu.lock: the sitecustomize
# registers the axon PJRT plugin in EVERY interpreter, so starting a
# python process while a TPU job runs can wedge the chip (CLAUDE.md).
# TPU sessions this round create the lockfile; lanes wait it out.
#
# Usage: bash tools/run_stats_r5.sh A|B   (one lane per core)
set -u
cd "$(dirname "$0")/.."
mkdir -p stats10

wait_tpu() {
  while [ -e /tmp/sir_tpu.lock ]; do sleep 30; done
}

HEC="nice -n 10 python experiments/hetero_edge_count/train.py --cpu \
    --nlayers 1 --nodes 50 --epochs 500 --batch-size 256 --lr 1e-3 \
    --factor 0.5 --patience 10"

lane_A() {
  wait_tpu; $HEC --model GCN --nhidden 20 --classes 2 > stats10/hec_gcn_c2.log 2>&1
  wait_tpu; $HEC --model GIN --nhidden 20 --classes 2 > stats10/hec_gin_c2.log 2>&1
}

lane_B() {
  wait_tpu; $HEC --model GAT --nhidden 20 --classes 2 --nheads 1 > stats10/hec_gat_c2.log 2>&1
  wait_tpu; $HEC --model SIR --nhidden 60 --classes 6 > stats10/hec_sir_c6.log 2>&1
}

case "${1:-}" in
  A) lane_A ;;
  B) lane_B ;;
  *) echo "usage: $0 A|B" >&2; exit 1 ;;
esac
