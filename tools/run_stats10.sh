#!/bin/bash
# 10-run statistics at the reference's protocol (VERDICT r2 item 4):
# the README commands verbatim (nruns defaults to 10), CPU, two lanes
# for the 2-core box. Do NOT run while a TPU job is active.
# Logs to stats10/<row>.log; summarize with: grep -H "Average test" stats10/*.log
set -u
cd "$(dirname "$0")/.."
mkdir -p stats10

DL="python experiments/dictionary_lookup/train.py --cpu --nlayers 1 \
    --epochs 500 --batch-size 256 --lr 1e-3 --factor 0.5 --patience 10"
HEC="python experiments/hetero_edge_count/train.py --cpu --nlayers 1 \
    --nodes 50 --epochs 500 --batch-size 256 --lr 1e-3 --factor 0.5 \
    --patience 10"

lane_a() {
  $DL --model SIR  --nhidden 40  --nodes 10 > stats10/dl_sir_n10.log 2>&1
  $DL --model GCN  --nhidden 40  --nodes 10 > stats10/dl_gcn_n10.log 2>&1
  $DL --model SAGE --nhidden 40  --nodes 10 > stats10/dl_sage_n10.log 2>&1
  $DL --model GAT  --nhidden 40  --nodes 10 --nheads 1 \
      > stats10/dl_gat_n10.log 2>&1
  $DL --model SIR  --nhidden 80  --nodes 20 > stats10/dl_sir_n20.log 2>&1
}

lane_b() {
  $HEC --model SIR --nhidden 20 --classes 2 > stats10/hec_sir_c2.log 2>&1
  $HEC --model SIR --nhidden 40 --classes 4 > stats10/hec_sir_c4.log 2>&1
  $DL --model SIR --nhidden 200 --nodes 50 > stats10/dl_sir_n50.log 2>&1
}

lane_a &
A=$!
lane_b &
B=$!
wait $A $B
grep -H "Average test" stats10/*.log
