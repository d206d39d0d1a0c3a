#!/usr/bin/env python
"""Headline benchmark: flash-attention forward, D=128, BF16, on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is roofline utilization on the local chip generation —
the north-star target is >= 0.85 (BASELINE.json); the reference achieves
0.83-0.94 utilization on its hardware (README.md:15,167-175).

Run on the real TPU (default env). Extra diagnostics go to stderr.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.utils.roofline import attention_flops, measure_chained
from mfa_tpu.ops.params import detect_generation


def main():
    gen = detect_generation()
    print(f"# device: {jax.devices()[0].device_kind} → generation {gen.name}",
          file=sys.stderr)

    batch, heads, seq, d = 1, 8, 4096, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((batch, heads, seq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, heads, seq, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, heads, seq, d)), jnp.bfloat16)

    flops = attention_flops("forward", seq, seq, d, batch_heads=batch * heads)
    bytes_accessed = (3 * batch * heads * seq * d * 2      # q,k,v bf16 in
                      + batch * heads * seq * d * 2        # o out
                      + batch * heads * seq * 4)           # L out
    # Median of 3 full measured runs (each itself a median-of-3 slope):
    # single samples flap +-0.03-0.05 across the tunnel (round-4 verdict
    # weak #2) — the official artifact records the median and the spread.
    runs = [
        measure_chained(
            lambda qq: flash_attention(qq, k, v, interpret=False),
            q, flops, bytes_accessed, name="attn_fwd_d128", generation=gen,
        )
        for _ in range(3)
    ]
    runs.sort(key=lambda r: r.latency_s)
    res = runs[1]
    utils = sorted(r.roofline_utilization for r in runs)

    print(
        f"# latency {res.latency_s*1e6:.0f} us | {res.tflops:.1f} TFLOP/s | "
        f"{res.ginstrs:.0f} GINSTRS/s | util {res.roofline_utilization:.3f} "
        f"(3-run spread {utils[0]:.3f}-{utils[-1]:.3f})",
        file=sys.stderr,
    )
    rec = {
        "metric": "attn_fwd_bf16_tflops_per_chip(N=4096,D=128,H=8)",
        "value": round(res.tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(res.roofline_utilization, 4),
        "spread": [round(utils[0], 4), round(utils[-1], 4)],
    }
    # Embed the decode headline (the other half of BASELINE.json's north
    # star) when bench_decode.py has recorded one — decode setup is minutes
    # of weight init over the tunnel, too fragile to re-run here.
    try:
        import os
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "docs", "sweeps",
                               "decode_headline.json")) as f:
            dec = json.load(f)
        rec["decode_metric"] = dec["metric"]
        rec["decode_tok_s"] = dec["value"]
        rec["decode_vs_baseline"] = dec["vs_baseline"]
    except (OSError, KeyError, ValueError):
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
