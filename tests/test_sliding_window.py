"""Sliding-window attention (Mistral-style) across prefill, backward,
decode, and the model config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.ops.decode import decode_attention
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.ops.reference import (
    attention_grads_reference,
    attention_reference,
)
from mfa_tpu.serving import kv_cache
from mfa_tpu.utils.testing import assert_close, make_attention_inputs


@pytest.mark.parametrize("r,c,w", [(128, 128, 32), (200, 200, 100),
                                   (64, 256, 48)])
def test_swa_fwd(rng, r, c, w):
    q, k, v, _ = make_attention_inputs(rng, 1, 2, 2, r, c, 32)
    o = flash_attention(q, k, v, causal=True, sliding_window=w)
    want, _ = attention_reference(q, k, v, causal=True, sliding_window=w)
    assert_close(o, want, 3e-5, f"SWA O r={r} c={c} w={w}")


def test_swa_bwd(rng):
    r = c = 160
    w = 64
    q, k, v, do = make_attention_inputs(rng, 1, 1, 1, r, c, 32)

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=True, sliding_window=w)
        return jnp.sum(do * o)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do, causal=True,
                                              sliding_window=w)
    assert_close(dq, wq, 5e-5, "SWA dQ")
    assert_close(dk, wk, 5e-5, "SWA dK")
    assert_close(dv, wv, 5e-5, "SWA dV")


def test_swa_window_one_is_diagonal(rng):
    """W=1: each token attends only itself → O = V."""
    q, k, v, _ = make_attention_inputs(rng, 1, 1, 1, 64, 64, 16)
    o = flash_attention(q, k, v, causal=True, sliding_window=1)
    assert_close(o, v, 3e-5, "SWA W=1")


def test_swa_decode(rng):
    """Decode with a window: only the last W cached tokens matter."""
    b, hq, hkv, d, max_len, w = 1, 4, 2, 32, 256, 50
    ln = 200
    cache = kv_cache.create(b, hkv, max_len, d, OperandPrecision.BF16)
    k_all = jnp.asarray(rng.standard_normal((b, hkv, ln, d)), jnp.float32)
    v_all = jnp.asarray(rng.standard_normal((b, hkv, ln, d)), jnp.float32)
    cache = kv_cache.update(cache, k_all, v_all)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    o = decode_attention(q, cache, sliding_window=w)
    # Oracle: attention over the last w tokens only.
    want, _ = attention_reference(q[:, :, None, :],
                                  k_all[:, :, ln - w:], v_all[:, :, ln - w:])
    assert_close(o[:, :, None, :], want, 2e-2, "SWA decode O")


def test_mistral_config_runs(rng):
    cfg = llama.LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=2,
                            n_kv_heads=2, ffn_hidden=128,
                            sliding_window=16)
    params = llama.init_params(jax.random.key(0), cfg, jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 128, (1, 40)), jnp.int32)
    full = llama.forward(params, cfg, tokens)
    assert bool(jnp.all(jnp.isfinite(full)))

    # prefill + decode parity under SWA
    caches = llama.make_caches(cfg, 1, 64)
    _, caches = llama.forward(params, cfg, tokens[:, :-1], caches=caches)
    logits, _ = llama.decode_step(params, cfg, tokens[:, -1], caches)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, -1]),
                               atol=5e-2, rtol=1e-2)
