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
