"""Evaluation harness: perplexity with and without quantized KV/weights.

North-star acceptance gate (BASELINE.json): model perplexity delta <= 0.05
vs BF16 KV at the same bit-width; attention outputs within 1e-2 of the
FP16 reference. This module computes both sides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama


def perplexity_full(params, cfg, tokens) -> float:
    """Teacher-forced perplexity via the (flash-kernel) causal forward."""
    logits = llama.forward(params, cfg, tokens[:, :-1])
    tgt = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return float(jnp.exp(jnp.mean(nll)))


def perplexity_decode(params, cfg, tokens, kv_precision, max_len=None) -> float:
    """Teacher-forced perplexity through the *decode path*: prefill one
    token, then score each next token from decode_step logits — exercises
    the KV cache (possibly quantized) + fused-dequant decode kernel."""
    b, t = tokens.shape
    max_len = max_len or (t + 8)
    # Prefill token 0, then walk the sequence: feeding token i appends its
    # KV and returns logits predicting token i+1.
    caches = llama.make_caches(cfg, b, max_len, kv_precision)
    _, caches = llama.forward(params, cfg, tokens[:, :1], caches=caches)
    nll_total, count = 0.0, 0
    for i in range(1, t):
        logits, caches = llama.decode_step(params, cfg, tokens[:, i], caches)
        # logits predict token i+1; score it when available.
        if i + 1 < t:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = tokens[:, i + 1]
            nll_total += float(-jnp.mean(
                jnp.take_along_axis(logp, tgt[:, None], axis=-1)))
            count += 1
    return float(np.exp(nll_total / max(count, 1)))


def kv_quantization_ppl_delta(params, cfg, tokens,
                              quant_precision) -> tuple[float, float, float]:
    """(ppl_bf16_kv, ppl_quant_kv, delta) through the decode path."""
    from mfa_tpu.ops.precision import OperandPrecision

    p_ref = perplexity_decode(params, cfg, tokens, OperandPrecision.BF16)
    p_q = perplexity_decode(params, cfg, tokens, quant_precision)
    return p_ref, p_q, abs(p_q - p_ref)
