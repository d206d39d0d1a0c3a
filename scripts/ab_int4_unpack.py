#!/usr/bin/env python
"""A/B the INT4 fused-dequant unpack on chip (round-5 VERDICT item 5).

Signed half-split nibbles (round 4: widen + <<28 >>28 + >>4, ~5 int VPU
ops/byte, measured 0.53 of the packed stream) vs biased-unsigned nibbles
+ rowsum correction (round 5: widen + &15 + >>4). Decode projections are
weight-stream-bound, so the win shows directly as packed-stream GB/s.

Shapes are the Llama-3-8B decode projections. Resumable via
docs/sweeps/int4_unpack.jsonl.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_int4_unpack.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from mfa_tpu.kernels import quant
from mfa_tpu.kernels.quant_matmul import int4_matmul
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.utils.roofline import measure_chained

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "int4_unpack.jsonl")

# (name, K, N) — 8B decode projections (dim 4096, ffn 14336, 32q/8kv heads)
SHAPES = [
    ("qkv", 4096, 6144),
    ("ffn_up", 4096, 14336),
    ("ffn_down", 14336, 4096),
]


def load_done():
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                done[(rec["shape"], rec["m"], rec["layout"])] = rec
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, nargs="+", default=[8, 32])
    args = ap.parse_args()

    gen = detect_generation()
    done = load_done()
    print(f"# {gen.name}, HBM {gen.hbm_gbps} GB/s", flush=True)
    rng = np.random.default_rng(0)

    for name, k, n in SHAPES:
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32)
        packs = {
            "signed": quant.pack_int4_halves(w),
            "biased": quant.pack_int4_biased(w),
        }
        for m in args.m:
            x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
            for layout, (packed, scale) in packs.items():
                key = (name, m, layout)
                if key in done:
                    print(f"  [cached] {key} {done[key].get('gbps')}",
                          flush=True)
                    continue
                # Per-iter HBM traffic: the packed weight stream dominates.
                byt = k // 2 * n + m * k * 2 + m * n * 2 + 4 * n
                flops = 2.0 * m * k * n
                t0 = time.time()

                def step(xx, packed=packed, scale=scale):
                    y = int4_matmul(xx, packed, scale)
                    dep = y.astype(jnp.float32)[:1, :1] * 1e-30
                    return (xx.astype(jnp.float32) + dep).astype(xx.dtype)

                try:
                    res = measure_chained(step, x, flops, byt,
                                          generation=gen, trials=2)
                    rec = {"shape": name, "k": k, "n": n, "m": m,
                           "layout": layout,
                           "gbps": round(res.hbm_gbps, 1),
                           "stream_frac": round(
                               res.hbm_gbps / gen.hbm_gbps, 3),
                           "latency_us": round(res.latency_s * 1e6, 1),
                           "wall_s": round(time.time() - t0, 1)}
                except Exception as e:  # noqa: BLE001
                    rec = {"shape": name, "k": k, "n": n, "m": m,
                           "layout": layout,
                           "error": str(e).splitlines()[0][:160],
                           "wall_s": round(time.time() - t0, 1)}
                with open(OUT, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"  {name} m={m} {layout}: "
                      f"{rec.get('stream_frac', rec.get('error'))}",
                      flush=True)


if __name__ == "__main__":
    main()
