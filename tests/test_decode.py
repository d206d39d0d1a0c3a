"""Decode attention + KV cache (bf16 / int8 / fp8) vs oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.ops.decode import decode_attention
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.ops.reference import attention_reference
from mfa_tpu.serving import kv_cache
from mfa_tpu.utils.testing import assert_close


def _fill_cache(rng, batch, hkv, lens, max_len, d, precision, t_chunk=None):
    """Build a cache by appending random KV; returns (cache, full k, v)."""
    cache = kv_cache.create(batch, hkv, max_len, d, precision)
    maxfill = max(lens)
    k_full = np.zeros((batch, hkv, maxfill, d), np.float32)
    v_full = np.zeros((batch, hkv, maxfill, d), np.float32)
    # All sequences in one cache must append together; emulate ragged fill
    # by appending the max and tracking true lens for the oracle, then
    # resetting lengths to the ragged values.
    k_all = rng.standard_normal((batch, hkv, maxfill, d)).astype(np.float32)
    v_all = rng.standard_normal((batch, hkv, maxfill, d)).astype(np.float32)
    cache = kv_cache.update(cache, jnp.asarray(k_all), jnp.asarray(v_all))
    cache = kv_cache.KVCache(
        k=cache.k, v=cache.v, k_scale=cache.k_scale, v_scale=cache.v_scale,
        lengths=jnp.asarray(lens, jnp.int32), precision=cache.precision,
    )
    return cache, k_all, v_all


@pytest.mark.parametrize("precision,tol", [
    (OperandPrecision.BF16, 2e-2),
    (OperandPrecision.INT8, 5e-2),
    (OperandPrecision.FP8_E4M3, 5e-2),
])
def test_decode_vs_oracle(rng, precision, tol):
    b, hq, hkv, d, max_len = 2, 8, 2, 64, 640
    lens = [300, 513]
    cache, k_all, v_all = _fill_cache(rng, b, hkv, lens, max_len, d, precision)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)

    o = decode_attention(q, cache)

    # Oracle per sequence with its true length (dequantized cache contents
    # so quantization error of K/V isn't double counted — the kernel must
    # match attention over what the cache actually stores).
    kd = np.asarray(cache.k.astype(jnp.float32) * cache.k_scale)[..., :d]
    vd = np.asarray(cache.v.astype(jnp.float32) * cache.v_scale)[..., :d]
    for i, ln in enumerate(lens):
        want, _ = attention_reference(
            np.asarray(q, np.float32)[i : i + 1, :, None, :],
            kd[i : i + 1, :, :ln],
            vd[i : i + 1, :, :ln],
        )
        assert_close(
            np.asarray(o, np.float32)[i, :, None, :], want[0], tol,
            f"decode O seq{i} ({precision.value})",
        )


def test_int8_cache_quantization_error(rng):
    """End-to-end: int8 cache vs FP32 KV oracle stays within the mixed
    budget (5e-2, Precisions.swift:28-35 scaled for int8)."""
    b, hq, hkv, d, max_len = 1, 4, 4, 32, 256
    lens = [256]
    cache, k_all, v_all = _fill_cache(
        rng, b, hkv, lens, max_len, d, OperandPrecision.INT8)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    o = decode_attention(q, cache)
    want, _ = attention_reference(
        np.asarray(q, np.float32)[:, :, None, :], k_all, v_all)
    assert_close(np.asarray(o, np.float32)[:, :, None, :], want, 6e-2,
                 "decode O int8 vs fp32 oracle")


def test_cache_append_decode_step(rng):
    """Appending one token then decoding sees the new token."""
    b, hkv, d, max_len = 1, 2, 32, 128
    cache = kv_cache.create(b, hkv, max_len, d, OperandPrecision.BF16)
    k0 = jnp.asarray(rng.standard_normal((b, hkv, 5, d)), jnp.float32)
    v0 = jnp.asarray(rng.standard_normal((b, hkv, 5, d)), jnp.float32)
    cache = kv_cache.update(cache, k0, v0)
    assert int(cache.lengths[0]) == 5

    k1 = jnp.asarray(rng.standard_normal((b, hkv, 1, d)), jnp.float32)
    v1 = jnp.asarray(rng.standard_normal((b, hkv, 1, d)), jnp.float32)
    cache = kv_cache.update(cache, k1, v1)
    assert int(cache.lengths[0]) == 6

    q = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)
    o = decode_attention(q, cache)
    kk = jnp.concatenate([k0, k1], axis=2)
    vv = jnp.concatenate([v0, v1], axis=2)
    want, _ = attention_reference(q[:, :, None, :], kk, vv)
    assert_close(o[:, :, None, :], want, 2e-2, "append+decode O")
