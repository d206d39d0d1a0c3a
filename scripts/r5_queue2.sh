#!/bin/bash
# Round-5 chip queue, phase 2 — priority-ordered for the remaining wall
# clock. Assumes the D=384/512 table rows were re-seeded from the phase-1
# sweep before launch. GEMM blocks + VMEM calibration ride at the tail
# (phase 1 was cut short to make room for the decode/train/bench items).
#
#   nohup bash scripts/r5_queue2.sh > /tmp/r5_queue2.log 2>&1 &
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

# 1. INT4 unpack A/B (signed vs biased) at 8B projection shapes.
run_step int4_ab 1500 1 python -u scripts/ab_int4_unpack.py

# 2. INT4-weight decode scaling: B=16 then the previously-OOM B=32.
run_step decode_b16 1800 1 python -u bench_decode.py --wbits 4 --batch 16
run_step decode_b32 1800 1 python -u bench_decode.py --wbits 4 --batch 32

# 3. bwd_kv D=384 retry (transient worker crash poisoned the first pass;
#    D=512 ran the same config class clean).
run_step d384_bkv2 1500 1 python -u scripts/sweep_r2.py --kernel backward_key_value --d 384

# 4. Large-D train utilization with the re-seeded rows.
run_step train_large_d 2100 1 python -u scripts/bench_train.py --d 384 512

# 5. Headline bench (median-of-3; must land >= 0.85).
run_step bench 1200 2 python -u bench.py

# 6. GEMM block sweep at the reference's large sizes.
run_step gemm_blocks 1800 1 python -u scripts/sweep_gemm_blocks.py

# 7. VMEM envelope compile-probe calibration.
run_step vmem 1500 1 python -u scripts/calibrate_vmem.py

# 8. Top-ups if the clock allows: narrow-bkv fwd candidates at 384/512.
run_step d384_fwd2 900 1 python -u scripts/sweep_r2.py --kernel forward --d 384
run_step d512_fwd2 900 1 python -u scripts/sweep_r2.py --kernel forward --d 512

echo "=== r5 queue2 complete ==="
