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
    kdq, vdq = cache.dequant()
    kd = np.asarray(kdq)[..., :d]
    vd = np.asarray(vdq)[..., :d]
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


@pytest.mark.parametrize("precision", [OperandPrecision.BF16,
                                       OperandPrecision.INT8,
                                       OperandPrecision.FP8_E4M3])
def test_fused_append_matches_update(rng, precision):
    """decode_attention_append must write EXACTLY what update() writes
    (same quantization formulas in-kernel) and attend equivalently; the
    new token's column is computed unquantized, so O may differ from the
    two-pass path only within the quantization budget."""
    from mfa_tpu.ops.decode import decode_attention_append

    b, hq, hkv, d, max_len = 2, 8, 2, 64, 640
    lens = [300, 513]
    cache, _, _ = _fill_cache(rng, b, hkv, lens, max_len, d, precision)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, hkv, d)) * 0.5, jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, hkv, d)) * 0.5, jnp.bfloat16)

    o_fused, cache_fused = decode_attention_append(q, k_new, v_new, cache)

    cache_two = kv_cache.update(cache, k_new[:, :, None, :],
                                v_new[:, :, None, :])
    o_two = decode_attention(q, cache_two)

    # Cache contents: bitwise-identical quantized rows; scales to 1 ULP
    # (reduction order of the in-kernel amax may differ from XLA's).
    for f in ("k", "v"):
        a = np.asarray(getattr(cache_fused, f).astype(jnp.float32))
        bb = np.asarray(getattr(cache_two, f).astype(jnp.float32))
        np.testing.assert_array_equal(a, bb, err_msg=f)
    for f in ("k_scale", "v_scale"):
        a = np.asarray(getattr(cache_fused, f))
        bb = np.asarray(getattr(cache_two, f))
        np.testing.assert_allclose(a, bb, rtol=1e-6, err_msg=f)
    np.testing.assert_array_equal(np.asarray(cache_fused.lengths),
                                  np.asarray(cache_two.lengths))

    tol = 2e-2 if precision is OperandPrecision.BF16 else 6e-2
    assert_close(np.asarray(o_fused, np.float32),
                 np.asarray(o_two, np.float32), tol, "fused O")


def test_fused_append_at_capacity(rng):
    """A slot at capacity must stop: lengths cap at max_len, the append
    window clamps in-bounds (no OOB read / last-8-row clobber — the
    round-4 advisor finding), and further steps leave the cache bitwise
    unchanged while still attending over the full cache."""
    from mfa_tpu.ops.decode import decode_attention_append

    b, hq, hkv, d, max_len = 1, 4, 2, 64, 128
    cache, _, _ = _fill_cache(rng, b, hkv, [max_len - 1], max_len, d,
                              OperandPrecision.INT8)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, hkv, d)) * 0.5, jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, hkv, d)) * 0.5, jnp.bfloat16)

    # Step 1 fills the last row: length max_len-1 -> max_len.
    _, cache = decode_attention_append(q, k_new, v_new, cache)
    assert int(cache.lengths[0]) == max_len
    snap_k = np.asarray(cache.k.astype(jnp.float32))
    snap_s = np.asarray(cache.k_scale)

    # Steps 2..4: full slot — lengths stay capped, contents stay frozen.
    for _ in range(3):
        o, cache = decode_attention_append(q, k_new, v_new, cache)
    assert int(cache.lengths[0]) == max_len
    np.testing.assert_array_equal(
        np.asarray(cache.k.astype(jnp.float32)), snap_k)
    np.testing.assert_allclose(np.asarray(cache.k_scale), snap_s, rtol=1e-6)
    assert np.isfinite(np.asarray(o, np.float32)).all()


def test_fp8_convert_domains_bit_exact():
    """The u16 twiddle domain (round-5 A/B candidate) must reproduce the
    i32 domain bit-for-bit over every fp8 byte pattern, both kinds."""
    import jax

    from mfa_tpu.kernels import decode as dk

    for fp8_dtype, kind in ((jnp.float8_e4m3fn, "e4m3"),
                            (jnp.float8_e5m2, "e5m2")):
        allb = jnp.arange(256, dtype=jnp.int32).astype(jnp.uint8)
        x = jax.lax.bitcast_convert_type(allb, fp8_dtype)
        assert dk.FP8_CONVERT_DOMAIN == "i32"
        ref = np.asarray(jax.lax.bitcast_convert_type(
            dk.fp8_to_bf16(x, kind), jnp.uint16))
        dk.FP8_CONVERT_DOMAIN = "u16"
        try:
            got = np.asarray(jax.lax.bitcast_convert_type(
                dk.fp8_to_bf16(x, kind), jnp.uint16))
        finally:
            dk.FP8_CONVERT_DOMAIN = "i32"
        np.testing.assert_array_equal(got, ref, err_msg=kind)


def test_decode_fp8_e5m2_cache(rng):
    """e5m2 KV storage path (gradient-format fp8; the bit-twiddle widening
    covers both fp8 layouts — kernels/decode.fp8_to_bf16)."""
    b, hq, hkv, d, max_len = 1, 4, 2, 64, 256
    cache, _, _ = _fill_cache(rng, b, hkv, [200], max_len, d,
                              OperandPrecision.FP8_E5M2)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    o = decode_attention(q, cache)
    kdq, vdq = cache.dequant()
    want, _ = attention_reference(
        np.asarray(q, np.float32)[:, :, None, :],
        np.asarray(kdq)[..., :d][:, :, :200],
        np.asarray(vdq)[..., :d][:, :, :200])
    assert_close(np.asarray(o, np.float32)[:, :, None, :], want, 6e-2,
                 "decode O e5m2")
