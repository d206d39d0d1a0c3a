#!/bin/bash
# Retry driver for on-chip sweeps: the remote tunnel occasionally stalls a
# single RPC forever (round-1 post-mortem), so run the resumable sweep under
# a hard timeout and restart until it completes. Each (kernel, D, blocks)
# result is flushed to docs/sweeps/r2_sweep.jsonl as soon as it's measured —
# a restart loses at most the in-flight candidate.
set -u
cd "$(dirname "$0")/.."
ARGS="$*"
for attempt in $(seq 1 10); do
  echo "=== sweep attempt $attempt: $ARGS ==="
  timeout 1500 python scripts/sweep_r2.py $ARGS && exit 0
  code=$?
  echo "=== attempt $attempt exited $code; retrying ==="
  sleep 5
done
echo "=== giving up after 10 attempts ==="
exit 1
