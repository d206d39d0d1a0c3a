#!/bin/bash
# Round-5 chip queue, phase 4: large-D train with the composable fwd row,
# then the (fixed) GEMM block sweep.
#   nohup bash scripts/r5_queue4.sh > /tmp/r5_queue4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run_step() {
  local name="$1" tmo="$2" tries="$3"; shift 3
  for attempt in $(seq 1 "$tries"); do
    echo "=== [$name] attempt $attempt: $* ==="
    timeout "$tmo" "$@" && { echo "=== [$name] OK ==="; return 0; }
    echo "=== [$name] exited $? — continuing ==="
    sleep 20
  done
  echo "=== [$name] DONE (capped) — continuing queue ==="
  return 1
}

run_step train_large_d 2100 1 python -u scripts/bench_train.py --d 384 512
run_step gemm_blocks 2400 1 python -u scripts/sweep_gemm_blocks.py
echo "=== r5 queue4 complete ==="
