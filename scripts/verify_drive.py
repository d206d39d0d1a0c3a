#!/usr/bin/env python
"""Real-chip verify drive: flash_attention fwd + grads + gemm vs oracles.

The drive the verify skill prescribes — run on the axon/TPU backend (default
env). Exit 0 = all budgets met.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.ops.gemm import gemm
from mfa_tpu.ops.reference import attention_reference, attention_grads_reference

rng = np.random.default_rng(0)
failures = []


def check(name, got, want, tol):
    err = float(np.max(np.abs(np.asarray(got, np.float32)
                              - np.asarray(want, np.float32))))
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|Δ|={err:.3g} (tol {tol:g})")
    if not ok:
        failures.append(name)


def main():
    print(f"# backend: {jax.default_backend()}, device {jax.devices()[0].device_kind}")

    # BF16 fwd+bwd, causal GQA, unaligned shapes.
    b, hq, hkv, r, c, d = 1, 4, 2, 512, 768, 128
    mk = lambda h, s: jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    q, k, v, do = mk(hq, r), mk(hkv, c), mk(hkv, c), mk(hq, r)
    o = flash_attention(q, k, v, causal=True, interpret=False)
    want_o, _ = attention_reference(q, k, v, causal=True)
    check("fwd O bf16 causal GQA", o, want_o, 5e-2)

    def loss(q, k, v):
        oo = flash_attention(q, k, v, causal=True, interpret=False)
        return jnp.sum(do.astype(jnp.float32) * oo.astype(jnp.float32))

    dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do, causal=True)
    check("bwd dQ bf16", dq, wq, 5e-2)
    check("bwd dK bf16", dk, wk, 5e-2)
    check("bwd dV bf16", dv, wv, 5e-2)

    # FP32 fwd, tight budget.
    qf = jnp.asarray(rng.standard_normal((1, 2, 333, 80)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((1, 2, 517, 80)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((1, 2, 517, 80)), jnp.float32)
    of = flash_attention(qf, kf, vf, interpret=False)
    wof, _ = attention_reference(qf, kf, vf)
    check("fwd O fp32 unaligned", of, wof, 2e-5)

    # O-memory policy on chip: lpi=False → fp32 O.
    o32 = flash_attention(q, k, v, causal=True, interpret=False,
                          low_precision_intermediates=False)
    assert o32.dtype == jnp.float32, o32.dtype
    check("fwd O fp32-memory (policy)", o32, want_o, 5e-2)

    # GEMM: bf16 + fp32, transposes, accumulate. bf16 inputs are exact in
    # fp32, so the fp32-out check is tight; the bf16-out check only sees the
    # final rounding of C (|C| ~ sqrt(K) => quantum ~ 2^-8 * 16).
    a = jnp.asarray(rng.standard_normal((300, 200)), jnp.bfloat16)
    bb = jnp.asarray(rng.standard_normal((200, 150)), jnp.bfloat16)
    want_c = np.asarray(a, np.float32) @ np.asarray(bb, np.float32)
    check("gemm bf16 (fp32 out)",
          gemm(a, bb, out_dtype=jnp.float32, interpret=False), want_c, 1e-3)
    check("gemm bf16 (bf16 out)", gemm(a, bb, interpret=False), want_c, 2e-1)
    a32 = jnp.asarray(rng.standard_normal((129, 257)), jnp.float32)
    b32 = jnp.asarray(rng.standard_normal((64, 257)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((129, 64)), jnp.float32)
    got = gemm(a32, b32, c0, transpose_b=True, interpret=False)
    check("gemm fp32 T+acc", got,
          np.asarray(a32) @ np.asarray(b32).T + np.asarray(c0), 2e-4)

    if failures:
        print(f"VERIFY FAILED: {failures}")
        sys.exit(1)
    print("VERIFY OK")


if __name__ == "__main__":
    main()
