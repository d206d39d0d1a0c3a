#!/usr/bin/env python
"""Prefill (admission) cost at 8B shapes — the scheduler's batch-1 bucketed
prefill (round-3 VERDICT weak #9: 'the prefill cost is unmeasured').

Measures llama.forward with a batch-1 cache at each prompt bucket, INT8
weights, reports latency + MXU utilization vs the causal-prefill cost model
(projection/MLP FLOPs + (2D+5)N^2/2 attention). Appends JSON to
docs/sweeps/prefill_bench.jsonl.

    PYTHONPATH=/root/repo python scripts/bench_prefill.py --layers 8
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama
from mfa_tpu.ops.params import detect_generation
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving import kv_cache as kvm
from mfa_tpu.utils.roofline import measure_chained

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "prefill_bench.jsonl")


def model_flops(cfg, t):
    """Dense projections/MLP/head FLOPs + causal attention FLOPs for a
    T-token prefill (weights count 2·params·T)."""
    hd = cfg.head_dim
    per_layer = (cfg.dim * (cfg.n_heads + 2 * cfg.n_kv_heads) * hd
                 + cfg.n_heads * hd * cfg.dim + 3 * cfg.dim * cfg.ffn_hidden)
    dense = 2 * t * (cfg.n_layers * per_layer + cfg.dim * cfg.vocab_size)
    attn = cfg.n_layers * cfg.n_heads * (2 * hd + 5) * t * t / 2 * 2
    return dense + attn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--buckets", type=int, nargs="+",
                    default=[128, 512, 1024, 2048])
    args = ap.parse_args()

    gen = detect_generation()
    cfg = llama.LlamaConfig(n_layers=args.layers)
    params = llama.init_params_quantized(
        jax.random.key(0), cfg, OperandPrecision.INT8, jnp.bfloat16)
    rng = np.random.default_rng(0)
    print(f"# prefill, {args.layers} layers, INT8 weights, {gen.name}",
          flush=True)

    for t in args.buckets:
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, t)),
                             jnp.int32)

        def step(carry, t=t):
            params_, toks = carry
            caches1 = llama.make_caches(cfg, 1, t + 8,
                                        OperandPrecision.FP8_E4M3)
            logits, _ = llama.forward(params_, cfg, toks, caches=caches1)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return (params_, toks.at[:, 0].set(nxt))

        res = measure_chained(step, (params, tokens), 1, 0, generation=gen)
        fl = model_flops(cfg, t)
        util = fl / res.latency_s / (gen.bf16_tflops * 1e12)
        rec = {"bucket": t, "layers": args.layers,
               "latency_ms": round(res.latency_s * 1e3, 2),
               "model_tflops": round(fl / 1e12, 2),
               "mxu_util": round(util, 3)}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
