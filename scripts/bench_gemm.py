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
import numpy as np

from mfa_tpu.ops import gemm as gemm_mod
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.utils.autotune import tune_gemm
from mfa_tpu.utils.roofline import measure_chained

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "gemm_bench.jsonl")


def bench_transpose_states(size: int, gen):
    """All four transpose states through the PUBLIC dispatch path with the
    on-dispatch autotune hook active — the reference's per-state table
    (main.cpp:23-43) produced the same way its client would see it."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((size, size)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((size, size)), jnp.bfloat16)
    flops = 2.0 * size ** 3
    out = {}
    gemm_mod.set_autotune(True)
    try:
        for ta in (False, True):
            for tb in (False, True):
                # Concrete warm call FIRST: triggers the cache-miss candidate
                # search with real arrays (the hook measures on-device; it
                # must not fire during the jitted chain's trace).
                gemm_mod.gemm(a, b, transpose_a=ta, transpose_b=tb,
                              interpret=False)

                def step(x, ta=ta, tb=tb):
                    return gemm_mod.gemm(x, b, transpose_a=ta, transpose_b=tb,
                                         interpret=False).astype(jnp.bfloat16)

                res = measure_chained(step, a, flops, 0, generation=gen,
                                      trials=3)
                key = next((k for k in gemm_mod._tuned_blocks
                            if k[7] == ta and k[8] == tb and k[0] == size),
                           None)
                blocks = gemm_mod._tuned_blocks.get(key) if key else None
                if blocks is not None and blocks != "xla":
                    blocks = list(blocks)
                state = f"{'T' if ta else 'N'}{'T' if tb else 'N'}"
                out[state] = {"tflops": round(res.tflops, 1),
                              "autotuned_blocks": blocks}
                print(f"  {state}: {res.tflops:7.1f} TFLOP/s "
                      f"blocks={blocks}", flush=True)
    finally:
        gemm_mod.set_autotune(None)
    return out


def main():
    gen = detect_generation()
    for size in (512, 1488, 1489):
        print(f"# tuning gemm {size}^3 bf16", flush=True)
        results, xla_tflops = tune_gemm(size, size, size, jnp.bfloat16,
                                        max_candidates=8)
        if not results:
            continue
        best_tf, blocks = results[0]
        states = bench_transpose_states(size, gen)
        rec = {"size": size, "dtype": "bf16",
               "pallas_tflops": round(best_tf, 1),
               "xla_tflops": round(xla_tflops, 1),
               "vs_xla": round(best_tf / xla_tflops, 4),
               "blocks": list(blocks),
               "transpose_states": states}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
