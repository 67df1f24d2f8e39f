#!/bin/bash
# Round-5 TPU statistics lanes (VERDICT r4 item 4b/4c): DictionaryLookup
# SIR n=30/40 and HeteroEdgeCount SIR c=6 at the reference's full 10-run
# protocol, one TPU process each, sequential, with /tmp/sir_tpu.lock held
# (the CPU lanes gate their python launches on it — CLAUDE.md).
# Reference commands: --nhidden 4n (DL) / 10c (HEC), 500 epochs, batch
# 256, lr 1e-3, plateau 0.5/10, nruns 10.
set -u
cd "$(dirname "$0")/.."
mkdir -p stats10
touch /tmp/sir_tpu.lock
trap 'rm -f /tmp/sir_tpu.lock' EXIT

DL="python experiments/dictionary_lookup/train.py --nlayers 1 \
    --epochs 500 --batch-size 256 --lr 1e-3 --factor 0.5 --patience 10"
HEC="python experiments/hetero_edge_count/train.py --nlayers 1 \
    --nodes 50 --epochs 500 --batch-size 256 --lr 1e-3 --factor 0.5 \
    --patience 10"

timeout 7200 $DL --model SIR --nhidden 120 --nodes 30 \
    > stats10/dl_sir_n30.log 2>&1
echo "n30 rc=$?"; sleep 30
timeout 7200 $DL --model SIR --nhidden 160 --nodes 40 \
    > stats10/dl_sir_n40.log 2>&1
echo "n40 rc=$?"; sleep 30
timeout 10800 $HEC --model SIR --nhidden 60 --classes 6 \
    > stats10/hec_sir_c6.log 2>&1
echo "c6 rc=$?"
grep -H "Average test" stats10/dl_sir_n30.log stats10/dl_sir_n40.log \
    stats10/hec_sir_c6.log
