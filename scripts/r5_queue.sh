#!/bin/bash
# Round-5 chip-job queue: the measurement backlog behind VERDICT items
# 4 (D=384/512 rows), 6 (GEMM large-size reclaim), 9 (VMEM envelope
# calibration) and 10 (fp8 widening cost). Sweeps get a SINGLE capped
# attempt (resumable — partial coverage is fine; a handful of measured
# candidates re-seeds a table row); only the short harnesses retry.
#
#   nohup bash scripts/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
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

# 1. D=384 / D=512 block sweeps (VERDICT item 4), single capped attempt.
run_step d384_bq  1500 1 python -u scripts/sweep_r2.py --kernel backward_query --d 384
run_step d384_bkv 1500 1 python -u scripts/sweep_r2.py --kernel backward_key_value --d 384
run_step d512_fwd 1200 1 python -u scripts/sweep_r2.py --kernel forward --d 512
run_step d512_bq  1200 1 python -u scripts/sweep_r2.py --kernel backward_query --d 512
run_step d512_bkv 1200 1 python -u scripts/sweep_r2.py --kernel backward_key_value --d 512

# 2. GEMM block sweep at the reference's large sizes (VERDICT item 6).
run_step gemm_blocks 1800 2 python -u scripts/sweep_gemm_blocks.py

# 3. VMEM envelope compile-probe calibration (VERDICT item 9).
run_step vmem 1500 2 python -u scripts/calibrate_vmem.py

# 4. fp8 convert-domain A/B (VERDICT item 10).
run_step fp8_ab 1200 2 python -u scripts/ab_fp8_convert.py

echo "=== r5 queue complete ==="
