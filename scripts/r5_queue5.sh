#!/bin/bash
# Round-5 chip queue, phase 5: measure the bwd_q D=128 whole-sequence
# traversal configs the old VMEM envelope wrongly pruned (compile probes
# show they build; the sweep's filter never let them run).
#   nohup bash scripts/r5_queue5.sh > /tmp/r5_queue5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run_step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name]: $* ==="
  timeout "$tmo" "$@" && echo "=== [$name] OK ===" || echo "=== [$name] exit $? ==="
}

run_step bwdq_ws1 900 python -u scripts/sweep_r2.py --kernel backward_query --d 128 --blocks 1024,4096,128
run_step bwdq_ws2 900 python -u scripts/sweep_r2.py --kernel backward_query --d 128 --blocks 512,4096,128
echo "=== r5 queue5 complete ==="
