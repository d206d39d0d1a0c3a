"""Test-harness canaries carried over from the reference (SURVEY.md §4).

- OOB garbage-tail canary (MTLContext+Buffers.swift:9-18): the padding
  region beyond the declared problem bounds is filled with uniform garbage
  in [-20, 20]; a kernel that reads past the bounds (wrong index map,
  missing edge mask) corrupts outputs detectably.
- NaN-output canary (SquareAttentionTest.swift:286): every output element
  must be written with a finite value.

The negative control builds a deliberately-broken kernel (no column-edge
mask) and asserts the canary CATCHES it — the "break the BlockSpec, fail
the canary" requirement.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.kernels import flash_fwd
from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.ops.descriptors import (
    AttentionDescriptor,
    AttentionKernelType,
    round_up,
)
from mfa_tpu.ops.reference import attention_reference
from mfa_tpu.utils.testing import (
    assert_close,
    assert_fully_written,
    garbage_pad,
    make_attention_inputs,
)


def _build_kernel_inputs(rng, r, c, d, kd, garbage: bool):
    """Fold + pad q/k/v the way ops/attention.py does, but with the padding
    region optionally garbage-filled (K/V tails past seq_len_kv are what the
    kernel's column-edge mask must neutralize)."""
    q, k, v, _ = make_attention_inputs(rng, 1, 2, 2, r, c, d)
    d_pad = round_up(d, 128)
    r_pad = round_up(r, kd.block_q)
    c_pad = round_up(c, kd.block_kv)
    fold = lambda x: x.reshape(x.shape[0] * x.shape[1], x.shape[2], x.shape[3])
    if garbage:
        pad = lambda x, s: garbage_pad(fold(x), s, d_pad, rng)
    else:
        pad = lambda x, s: jnp.pad(
            fold(x), ((0, 0), (0, s - x.shape[2]), (0, d_pad - d)))
    return q, k, v, pad(q, r_pad), pad(k, c_pad), pad(v, c_pad)


def _run_fwd(kd, q3, k3, v3, r, c, d, scale, num_heads=2):
    fn = flash_fwd.build_fwd(
        kd, batch_heads=num_heads, kv_batch_heads=num_heads,
        seq_len_q=r, seq_len_kv=c, d_pad=q3.shape[-1],
        scale=scale, q_dtype=q3.dtype, kv_dtype=k3.dtype,
        o_dtype=q3.dtype, interpret=True)
    return fn(q3, k3, v3)


def test_oob_garbage_canary_forward(rng):
    """K/V garbage past seq_len_kv must not leak into O (column-edge mask).

    Note the head-dim tail of K/Q must stay zero for the S contraction —
    that region is INSIDE the contraction bounds, so only the sequence tail
    carries garbage here (the analogue of the reference's buffer-tail
    garbage, which also sits past the logical array, not inside it).
    """
    r, c, d = 100, 200, 128     # d aligned so no head-dim padding exists
    desc = AttentionDescriptor(
        batch=1, num_q_heads=2, num_kv_heads=2,
        seq_len_q=r, seq_len_kv=c, head_dim=d)
    kd = desc.kernel_descriptor(AttentionKernelType.FORWARD)
    q, k, v, q3, k3, v3 = _build_kernel_inputs(rng, r, c, d, kd, garbage=True)

    o_pad, l_pad = _run_fwd(kd, q3, k3, v3, r, c, d, desc.softmax_scale)
    o = o_pad[:, :r, :d].reshape(1, 2, r, d)
    want, _ = attention_reference(q, k, v)
    assert_close(o, want, 2e-5, "O with garbage KV tail")
    assert_fully_written(o_pad[:, :r], "O rows")
    assert_fully_written(l_pad[:, :r], "L rows")


def test_oob_garbage_canary_catches_broken_mask(rng):
    """Negative control: a kernel variant whose column-edge mask is disabled
    (the moral equivalent of a broken BlockSpec index map reading past the
    bounds) MUST fail the garbage canary."""
    r, c, d = 100, 200, 128
    desc = AttentionDescriptor(
        batch=1, num_q_heads=2, num_kv_heads=2,
        seq_len_q=r, seq_len_kv=c, head_dim=d)
    kd = desc.kernel_descriptor(AttentionKernelType.FORWARD)
    q, k, v, q3, k3, v3 = _build_kernel_inputs(rng, r, c, d, kd, garbage=True)

    # Broken kernel: lie that seq_len_kv is the padded length, so the edge
    # mask never fires and the garbage columns join the softmax.
    c_pad = k3.shape[1]
    o_pad, _ = _run_fwd(kd, q3, k3, v3, r, c_pad, d, desc.softmax_scale)
    o = o_pad[:, :r, :d].reshape(1, 2, r, d)
    want, _ = attention_reference(q, k, v)
    with pytest.raises(AssertionError):
        assert_close(o, want, 2e-5, "O with broken edge mask")


def test_garbage_canary_through_public_api(rng):
    """The public wrapper owns padding; with aligned shapes plus the OOB
    canary at the kernel level covered above, this locks the end-to-end
    path: unaligned public shapes → correct output, fully written."""
    q, k, v, _ = make_attention_inputs(rng, 1, 2, 2, 77, 173, 40)
    o = flash_attention(q, k, v)
    want, _ = attention_reference(q, k, v)
    assert_close(o, want, 2e-5, "O public unaligned")
    assert_fully_written(o, "O public")


def test_nan_canary_catches_partial_write():
    """assert_fully_written flags a buffer with an unwritten (NaN) hole."""
    buf = np.ones((4, 8), np.float32)
    buf[2, 3] = np.nan
    with pytest.raises(AssertionError):
        assert_fully_written(buf, "holey")
