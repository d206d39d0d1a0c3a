"""Paged KV cache + paged decode kernel vs oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.ops.decode import paged_decode_attention
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.ops.reference import attention_reference
from mfa_tpu.serving.paged_kv_cache import PAGE_SIZE, PagedKVCache
from mfa_tpu.utils.testing import assert_close


def _build(rng, num_seqs, hkv, d, lens, precision, num_pages=64,
           max_len=1024):
    cache = PagedKVCache(num_pages, hkv, d, num_seqs, max_len, precision)
    ks, vs = [], []
    for s, ln in enumerate(lens):
        k = rng.standard_normal((hkv, ln, d)).astype(np.float32)
        v = rng.standard_normal((hkv, ln, d)).astype(np.float32)
        # Append in uneven chunks to exercise page-boundary splits.
        off = 0
        for chunk in (7, 130, 64, 10_000):
            n = min(chunk, ln - off)
            if n <= 0:
                break
            cache.append(s, jnp.asarray(k[:, off:off + n]),
                         jnp.asarray(v[:, off:off + n]))
            off += n
        ks.append(k)
        vs.append(v)
    return cache, ks, vs


@pytest.mark.parametrize("precision,tol", [
    (OperandPrecision.BF16, 2e-2),
    (OperandPrecision.INT8, 6e-2),
])
def test_paged_decode_vs_oracle(rng, precision, tol):
    num_seqs, hq, hkv, d = 2, 8, 2, 64
    lens = [200, 391]
    cache, ks, vs = _build(rng, num_seqs, hkv, d, lens, precision)
    q = jnp.asarray(rng.standard_normal((num_seqs, hq, d)), jnp.bfloat16)
    o = paged_decode_attention(q, cache)
    for s, ln in enumerate(lens):
        want, _ = attention_reference(
            np.asarray(q, np.float32)[s:s+1, :, None, :],
            ks[s][None], vs[s][None])
        assert_close(np.asarray(o, np.float32)[s, :, None, :], want[0], tol,
                     f"paged O seq{s} {precision.value}")


def test_page_allocation_and_free(rng):
    cache = PagedKVCache(num_pages=8, num_kv_heads=1, head_dim=32,
                         num_seqs=2, max_len=512,
                         precision=OperandPrecision.BF16)
    assert cache.free_pages == 7  # page 0 reserved
    k = jnp.ones((1, 300, 32))
    cache.append(0, k, k)
    assert cache.pages_in_use(0) == 3  # ceil(300/128)
    assert cache.free_pages == 4
    cache.free_seq(0)
    assert cache.free_pages == 7
    assert int(cache.lengths[0]) == 0


def test_pool_exhaustion(rng):
    cache = PagedKVCache(num_pages=3, num_kv_heads=1, head_dim=32,
                         num_seqs=1, max_len=1024,
                         precision=OperandPrecision.BF16)
    k = jnp.ones((1, PAGE_SIZE * 2, 32))
    cache.append(0, k, k)          # uses both free pages
    with pytest.raises(MemoryError, match="exhausted"):
        cache.append(0, jnp.ones((1, 1, 32)), jnp.ones((1, 1, 32)))


def test_max_len_guard(rng):
    cache = PagedKVCache(num_pages=16, num_kv_heads=1, head_dim=32,
                         num_seqs=1, max_len=256,
                         precision=OperandPrecision.BF16)
    with pytest.raises(ValueError, match="exceeds max_len"):
        cache.append(0, jnp.ones((1, 300, 32)), jnp.ones((1, 300, 32)))


def test_page_reuse_no_leak(rng):
    """Free then reuse: new sequence data must not see stale pages."""
    cache = PagedKVCache(num_pages=8, num_kv_heads=1, head_dim=32,
                         num_seqs=1, max_len=512,
                         precision=OperandPrecision.BF16)
    k1 = jnp.full((1, 130, 32), 7.0)
    cache.append(0, k1, k1)
    cache.free_seq(0)
    k2 = jnp.asarray(rng.standard_normal((1, 40, 32)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((1, 40, 32)), jnp.float32)
    cache.append(0, k2, v2)
    q = jnp.asarray(rng.standard_normal((1, 1, 32)), jnp.float32)
    o = paged_decode_attention(q, cache)
    want, _ = attention_reference(q[:, :, None, :], k2[None], v2[None])
    assert_close(o[:, :, None, :], want, 2e-2, "paged O after reuse")
