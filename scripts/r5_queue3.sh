#!/bin/bash
# Round-5 chip queue, phase 3: validate the qg-gated tables end-to-end
# (train at large D and the re-gated D=256), probe headline configs
# through the public API, re-record the headline, then the GEMM block
# sweep.
#
#   nohup bash scripts/r5_queue3.sh > /tmp/r5_queue3.log 2>&1 &
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

# 1. Train utilization at D=384/512 with the gated qg + measured rows.
run_step train_large_d 2100 1 python -u scripts/bench_train.py --d 384 512

# 2. Re-verify the D=128/256 train classes after the qg gate.
run_step train_mid 1500 1 python -u scripts/bench_train.py --d 128 256

# 3. Headline-shape config probe through the public API.
run_step headline_probe 1500 1 python -u scripts/ab_headline.py

# 4. Headline bench (median-of-3).
run_step bench 1200 2 python -u bench.py

# 5. GEMM block sweep at the reference's large sizes.
run_step gemm_blocks 2400 1 python -u scripts/sweep_gemm_blocks.py

echo "=== r5 queue3 complete ==="
