"""Quantization primitive round-trips."""

import jax.numpy as jnp
import numpy as np

from mfa_tpu.kernels import quant
from mfa_tpu.utils.testing import assert_close


def test_int8_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    q, s = quant.quantize_int8(x)
    assert q.dtype == jnp.int8
    assert s.shape == (16, 1)
    back = quant.dequantize(q, s)
    # worst-case step = amax/127
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert np.all(np.abs(np.asarray(back) - np.asarray(x)) <= amax / 127 * 0.51)


def test_fp8_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((8, 32)) * 10, jnp.float32)
    q, s = quant.quantize_fp8(x)
    assert q.dtype == jnp.float8_e4m3fn
    back = quant.dequantize(q, s)
    assert_close(back, x, float(np.abs(np.asarray(x)).max()) * 0.07, "fp8")


def test_int4_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    packed, s = quant.quantize_int4(x)
    assert packed.shape == (4, 8)
    back = quant.dequantize_int4(packed, s)
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert np.all(np.abs(np.asarray(back) - np.asarray(x)) <= amax / 7 * 0.51)


def test_int4_pack_order(rng):
    x = jnp.asarray([[1.0, -2.0, 3.0, -4.0]], jnp.float32)
    packed, s = quant.quantize_int4(x)
    vals = quant.unpack_int4(packed) * s / 1  # int values scaled
    back = np.asarray(quant.unpack_int4(packed))
    # order preserved
    signs = np.sign(back[0])
    assert list(signs) == [1, -1, 1, -1]


def test_int4_halves_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((32, 24)), jnp.float32)
    packed, scale = quant.pack_int4_halves(w)
    assert packed.shape == (16, 24) and packed.dtype == jnp.int8
    lo, hi = quant.unpack_int4_halves(packed)
    back = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32) * scale
    amax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    assert np.all(np.abs(np.asarray(back - w)) <= amax / 7 * 0.51)


def test_int4_biased_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((32, 24)), jnp.float32)
    packed, scale = quant.pack_int4_biased(w)
    assert packed.shape == (16, 24) and packed.dtype == jnp.uint8
    lo, hi = quant.unpack_int4_biased(packed)
    back = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32) * scale
    amax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    assert np.all(np.abs(np.asarray(back - w)) <= amax / 7 * 0.51)
    # Biased layout stores the SAME logical values as the signed layout.
    packed_s, scale_s = quant.pack_int4_halves(w)
    lo_s, hi_s = quant.unpack_int4_halves(packed_s)
    np.testing.assert_array_equal(np.asarray(lo, np.int32),
                                  np.asarray(lo_s, np.int32))
    np.testing.assert_array_equal(np.asarray(hi, np.int32),
                                  np.asarray(hi_s, np.int32))
    np.testing.assert_allclose(np.asarray(scale), np.asarray(scale_s))


def _fused_matmul_case(rng, pack_fn, m, k, n, dtype):
    from mfa_tpu.kernels.quant_matmul import int4_matmul

    x = jnp.asarray(rng.standard_normal((m, k)), dtype)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    packed, scale = pack_fn(w)
    got = int4_matmul(x, packed, scale, interpret=True)
    if pack_fn is quant.pack_int4_biased:
        lo, hi = quant.unpack_int4_biased(packed)
    else:
        lo, hi = quant.unpack_int4_halves(packed)
    wq = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32) * scale
    want = (x.astype(jnp.float32) @ wq).astype(dtype)
    assert got.shape == (m, n) and got.dtype == jnp.dtype(dtype)
    scale_mag = float(np.abs(np.asarray(want)).max()) + 1.0
    tol = scale_mag * (2e-2 if dtype == jnp.bfloat16 else 1e-5)
    assert_close(got, want, tol, f"fused int4 matmul {pack_fn.__name__}")


def test_int4_matmul_signed_vs_dense(rng):
    _fused_matmul_case(rng, quant.pack_int4_halves, 16, 128, 96, jnp.float32)


def test_int4_matmul_biased_vs_dense(rng):
    # The biased path's rowsum correction must remove the +8 offset exactly
    # (up to accumulation order); validated against the dequantized dense
    # product, bf16 activations included.
    _fused_matmul_case(rng, quant.pack_int4_biased, 16, 128, 96, jnp.float32)
    _fused_matmul_case(rng, quant.pack_int4_biased, 9, 256, 130, jnp.bfloat16)
