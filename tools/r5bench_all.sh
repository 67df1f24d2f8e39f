#!/bin/bash
# Run the round-5 A/B variants sequentially, one TPU process each, with
# the /tmp/sir_tpu.lock held so the CPU stat lanes never launch a python
# interpreter mid-TPU-job (CLAUDE.md wedge hazard). Logs to
# stats10/r5logs/<variant>.log; JSON line is the last stdout line.
set -u
cd "$(dirname "$0")/.."
mkdir -p stats10/r5logs
touch /tmp/sir_tpu.lock
trap 'rm -f /tmp/sir_tpu.lock' EXIT

run() {
  local variant=$1 tmo=$2
  echo "=== $variant (timeout ${tmo}s) ==="
  timeout "$tmo" python tools/r5bench.py --variant "$variant" \
      > "stats10/r5logs/$variant.json" 2> "stats10/r5logs/$variant.log"
  local rc=$?
  if [ $rc -eq 124 ]; then echo "TIMEOUT"; else cat "stats10/r5logs/$variant.json"; fi
  sleep 5
}

run noedge_chain 600
run edge_new_chain 900
run edge_new_step 900
run edge_old_step 900
run max_new_chain 900
run max_new_step 900
run max_old_step 900
# edge_old_chain (10 grad steps of the generic edge path in one jit)
# reconfirmed pathological in the first r5 session: >850 s compile,
# killed — matching r3/r4. Not re-run every session.
