#!/usr/bin/env python
"""Headline-shape config probe THROUGH the public API (round-5 VERDICT
item 3: BENCH_r04 recorded 0.842 vs the >=0.85 bar, while the same-config
raw-kernel sweep measured 0.864 — a ~2% systematic gap between the
bench.py path and the sweep path). Probe (block_q, block_kv, qg)
candidates with bench.py's exact protocol (flash_attention + chained
timing at B=1 H=8 N=4096 D=128) so whatever wins IS what bench.py will
record. Results append to docs/sweeps/headline_probe.jsonl.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_headline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from mfa_tpu.ops import attention as attn_mod
from mfa_tpu.ops import descriptors as desc_mod
from mfa_tpu.ops import params as params_mod
from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.utils.roofline import attention_flops, measure_chained

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "sweeps", "headline_probe.jsonl")

# (block_q, block_kv, qg) — the shipped row first.
CANDS = [
    (1024, 4096, 512),
    (1024, 4096, 256),
    (2048, 4096, 512),
    (2048, 4096, 1024),
    (512, 4096, 512),
    (4096, 4096, 512),
]

BASE_TABLE = params_mod._TABLES[("forward", "bf16")]


def table_for(bq, bkv):
    return f"""
  128   |  {bq}   |   {bkv}   |  128    | Q
  inf   |   256   |   1024   |  128    |
"""


def main():
    gen = params_mod.detect_generation()
    batch, heads, seq, d = 1, 8, 4096, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((batch, heads, seq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, heads, seq, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, heads, seq, d)), jnp.bfloat16)
    flops = attention_flops("forward", seq, seq, d, batch_heads=batch * heads)

    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                r = json.loads(line)
                done.add((r["bq"], r["bkv"], r["qg"]))
            except (json.JSONDecodeError, KeyError):
                continue

    try:
        for bq, bkv, qg in CANDS:
            if (bq, bkv, qg) in done:
                continue
            if qg > bq:
                continue
            params_mod._TABLES[("forward", "bf16")] = table_for(bq, bkv)
            params_mod._PARSED.clear()
            desc_mod.set_qg_override(qg)
            attn_mod.attention_cache.clear()
            t0 = time.time()
            try:
                res = measure_chained(
                    lambda qq: flash_attention(qq, k, v, interpret=False),
                    q, flops, 0, generation=gen)
                rec = {"bq": bq, "bkv": bkv, "qg": qg,
                       "tflops": round(res.tflops, 2),
                       "util": round(res.compute_bound_utilization, 4),
                       "wall_s": round(time.time() - t0, 1)}
            except Exception as e:  # noqa: BLE001
                rec = {"bq": bq, "bkv": bkv, "qg": qg,
                       "error": str(e).splitlines()[0][:160],
                       "wall_s": round(time.time() - t0, 1)}
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"  bq={bq} bkv={bkv} qg={qg}: "
                  f"{rec.get('util', rec.get('error'))}", flush=True)
    finally:
        params_mod._TABLES[("forward", "bf16")] = BASE_TABLE
        params_mod._PARSED.clear()
        desc_mod.set_qg_override(None)


if __name__ == "__main__":
    main()
