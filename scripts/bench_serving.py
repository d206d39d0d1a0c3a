#!/usr/bin/env python
"""End-to-end continuous-batching serving throughput on the chip.

Drives the real scheduler (admission + bucketed prefill + lockstep decode +
retirement) with a mixed-length request stream at 8B dims and reports
generated tokens/s — the serving-layer number that sits above the
per-kernel decode benches (bench_decode.py measures the pure decode step;
this measures the system with prefill and slot churn included).

    PYTHONPATH=/root/repo python scripts/bench_serving.py --layers 8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving.scheduler import ContinuousBatchingScheduler, Request

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "serving_bench.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--kv", default="fp8", choices=["fp8", "int8", "bf16"])
    args = ap.parse_args()

    gen = detect_generation()
    cfg = llama.LlamaConfig(n_layers=args.layers)
    prec = {"fp8": OperandPrecision.FP8_E4M3,
            "int8": OperandPrecision.INT8,
            "bf16": OperandPrecision.BF16}[args.kv]
    t0 = time.time()
    params = llama.init_params_quantized(
        jax.random.key(0), cfg, OperandPrecision.INT8, jnp.bfloat16)
    print(f"# params {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    sched = ContinuousBatchingScheduler(
        params, cfg, num_slots=args.slots, max_len=1024,
        kv_precision=prec, prompt_buckets=(256, 512))
    reqs = [Request(prompt=list(rng.integers(1, cfg.vocab_size,
                                             int(rng.integers(100, 500)))),
                    max_new_tokens=args.new_tokens)
            for _ in range(args.requests)]

    # Warm the compiled steps with a throwaway request round.
    t0 = time.time()
    sched.submit(Request(prompt=[1] * 128, max_new_tokens=2))
    sched.run(max_steps=8)
    print(f"# warm/compile {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)

    for r in reqs:
        sched.submit(r)
    t0 = time.perf_counter()
    done = sched.run(max_steps=5000)
    wall = time.perf_counter() - t0
    gen_tokens = sum(len(c.tokens) for c in done if c.request in reqs)
    prefill_tokens = sum(len(c.request.prompt) for c in done
                         if c.request in reqs)
    rec = {
        "layers": args.layers, "slots": args.slots, "kv": args.kv,
        "requests": args.requests, "wall_s": round(wall, 2),
        "generated_tok_s": round(gen_tokens / wall, 1),
        "prefill_tok_s": round(prefill_tokens / wall, 1),
        "decode_steps": sched.stats["decode_steps"],
        "prefills": sched.stats["prefills"],
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
