#!/usr/bin/env python
"""GEMM benchmark at the reference's sizes: 512^3 / 1488^3 / 1489^3 BF16,
our Pallas GEMM vs XLA's native matmul (the reference publishes the same
three sizes from its C++ port, CppReference/main.cpp:23-43; 1489 is the
odd size that stresses edge handling).

Run on the real chip (exclusive grant — nothing else may hold it):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_gemm.py

Appends JSON records to docs/sweeps/gemm_bench.jsonl.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from mfa_tpu.utils.autotune import tune_gemm

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "gemm_bench.jsonl")


def main():
    for size in (512, 1488, 1489):
        print(f"# tuning gemm {size}^3 bf16", flush=True)
        results, xla_tflops = tune_gemm(size, size, size, jnp.bfloat16)
        if not results:
            continue
        best_tf, blocks = results[0]
        rec = {"size": size, "dtype": "bf16",
               "pallas_tflops": round(best_tf, 1),
               "xla_tflops": round(xla_tflops, 1),
               "vs_xla": round(best_tf / xla_tflops, 4),
               "blocks": list(blocks)}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
