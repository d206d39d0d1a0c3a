#!/bin/bash
# Round-3 chip-job queue, part 2: re-verify after the causal group-skip
# kernel change, then the remaining measurement backlog.
#   nohup bash scripts/r3_queue2.sh > /tmp/r3_queue2.log 2>&1 &
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

# 1. Numerics gate (kernels changed: causal group skip + broadcast masks).
run_step verify 600 python -u scripts/verify_drive.py

# 2. Complete the non-causal train table (D=256 was blocked by the VMEM
#    OOM; table row now 2048/512/256) and record causal with group skip.
run_step train256 900 python -u scripts/bench_train.py --d 256
run_step train_causal 1800 python -u scripts/bench_train.py --d 64 128 256 --causal

# 3. Decode headline (fused init+quantize fixes the 8B OOM).
run_step decode 2400 python -u bench_decode.py

# 4. GEMM vs XLA (iterative chain calibration fixes the garbage slopes).
run_step gemm 2400 python -u scripts/bench_gemm.py

# 5. Causal kernel sweeps at D=128 (candidates now include finer bkv).
run_step causal_fwd 1500 python -u scripts/sweep_r2.py --kernel forward --d 128 --causal
run_step causal_bq 1500 python -u scripts/sweep_r2.py --kernel backward_query --d 128 --causal
run_step causal_bkv 1500 python -u scripts/sweep_r2.py --kernel backward_key_value --d 128 --causal

# 6. FP32 tables at D in {64, 128}.
run_step fp32_fwd 1500 python -u scripts/sweep_r2.py --kernel forward --d 64 128 --dtype fp32
run_step fp32_bq 1500 python -u scripts/sweep_r2.py --kernel backward_query --d 64 128 --dtype fp32
run_step fp32_bkv 1500 python -u scripts/sweep_r2.py --kernel backward_key_value --d 64 128 --dtype fp32

# 7. Unexplored high-value fwd candidates the old VMEM filter blocked.
run_step fwd256_a 900 python -u scripts/sweep_r2.py --kernel forward --d 256 --blocks 512,4096,256
run_step fwd256_b 900 python -u scripts/sweep_r2.py --kernel forward --d 256 --blocks 1024,4096,256
run_step fwd128_a 900 python -u scripts/sweep_r2.py --kernel forward --d 128 --blocks 2048,4096,128

# 8. D=384 bf16 fwd (real D-blocking) + config-3 D=256 N=8192 check.
run_step d384 1500 python -u scripts/sweep_r2.py --kernel forward --d 384
run_step config3 1200 python -u scripts/sweep_r2.py --kernel forward --d 256 --n 8192 --blocks 256,4096,256

# 9. Leftover bwd_kv bkv=1024 candidates at D=256.
run_step bwdkv_tail 1500 python -u scripts/sweep_r2.py --kernel backward_key_value --d 256

# 10. Headline bench (embeds decode if step 3 recorded it).
run_step bench 900 python -u bench.py

echo "=== r3 queue2 complete ==="
