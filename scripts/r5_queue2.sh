#!/bin/bash
# Round-5 chip queue, phase 2: runs AFTER r5_queue.sh completes and after
# the D=384/512 table rows are re-seeded from the phase-1 sweep. INT4
# unpack A/B + the B=16/32 int4-weight decode scaling (VERDICT item 5),
# large-D train utilization with the measured rows (item 4), and the
# headline bench (item 3, median-of-3).
#
#   nohup bash scripts/r5_queue2.sh > /tmp/r5_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run_step() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    echo "=== [$name] attempt $attempt: $* ==="
    timeout "$tmo" "$@" && { echo "=== [$name] OK ==="; return 0; }
    echo "=== [$name] exited $? — retry in 30s ==="
    sleep 30
  done
  echo "=== [$name] FAILED after 3 attempts — continuing queue ==="
  return 1
}

probe() {
  python -u -c "
import numpy as np, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('probe ok', float(np.asarray(x @ x)[0, 0]))"
}
until timeout 180 bash -c "$(declare -f probe); probe"; do
  echo "=== tunnel still down; sleeping 120s ==="
  sleep 120
done

# 1. INT4 unpack A/B (signed vs biased) at 8B projection shapes.
run_step int4_ab 1800 python -u scripts/ab_int4_unpack.py

# 2. INT4-weight decode scaling: B=16 then the previously-OOM B=32.
run_step decode_b16 2400 python -u bench_decode.py --wbits 4 --batch 16
run_step decode_b32 2400 python -u bench_decode.py --wbits 4 --batch 32

# 3. D=384 fwd top-up: the narrow-bkv candidates added after the first
#    pass (sweep is resumable — only new candidates run).
run_step d384_fwd2 1200 python -u scripts/sweep_r2.py --kernel forward --d 384

# 4. Large-D train utilization with the re-seeded rows.
run_step train_large_d 2400 python -u scripts/bench_train.py --d 384 512

# 4. Headline bench (median-of-3; must land >= 0.85).
run_step bench 1200 python -u bench.py

echo "=== r5 queue2 complete ==="
