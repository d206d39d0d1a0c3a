#!/bin/bash
# Round-3 chip-job queue: runs the measurement backlog in priority order,
# each step under a hard timeout with retries (the tunnel occasionally
# wedges a single RPC forever — round-1 post-mortem). Each harness is
# resumable/idempotent, so a retry loses at most the in-flight unit.
#
#   nohup bash scripts/r3_queue.sh > /tmp/r3_queue.log 2>&1 &
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

# 0. Tunnel probe: cheap matmul; loops until the tunnel answers.
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

# 1. Verify drive (numerics gate for everything below).
run_step verify 600 python -u scripts/verify_drive.py

# 2. Combined FWD+BWD train table — the reference's headline artifact.
run_step train 1500 python -u scripts/bench_train.py --d 64 128 256
run_step train_causal 1500 python -u scripts/bench_train.py --d 64 128 256 --causal

# 3. Decode headline (full 32-layer config; writes decode_headline.json).
run_step decode 1800 python -u bench_decode.py

# 4. GEMM vs XLA at the reference's sizes.
run_step gemm 1800 python -u scripts/bench_gemm.py

# 5. Causal kernel sweep records at D=128 (fwd + both backwards).
run_step causal_sweep 1500 python -u scripts/sweep_r2.py --kernel forward --d 128 --causal
run_step causal_sweep_bq 1500 python -u scripts/sweep_r2.py --kernel backward_query --d 128 --causal
run_step causal_sweep_bkv 1500 python -u scripts/sweep_r2.py --kernel backward_key_value --d 128 --causal

# 6. FP32 tables at D in {64, 128}.
run_step fp32_fwd 1500 python -u scripts/sweep_r2.py --kernel forward --d 64 128 --dtype fp32
run_step fp32_bq 1500 python -u scripts/sweep_r2.py --kernel backward_query --d 64 128 --dtype fp32
run_step fp32_bkv 1500 python -u scripts/sweep_r2.py --kernel backward_key_value --d 64 128 --dtype fp32

# 7. D=384 bf16 fwd (real D-blocking, block_d < d_pad) + config-3 check
#    (D=256 N=8192 with the measured D-blocked row).
run_step d384 1500 python -u scripts/sweep_r2.py --kernel forward --d 384
run_step config3 1200 python -u scripts/sweep_r2.py --kernel forward --d 256 --n 8192 --blocks 256,4096,256

# 8. Leftover bwd_kv bkv=1024 candidates at D=256 (sweep is resumable).
run_step bwdkv_tail 1500 python -u scripts/sweep_r2.py --kernel backward_key_value --d 256

# 9. Headline bench (embeds decode number if step 3 recorded one).
run_step bench 900 python -u bench.py

echo "=== r3 queue complete ==="
