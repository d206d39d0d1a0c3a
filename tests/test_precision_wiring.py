"""Lock the policy→kernel wiring (round-2 VERDICT item 4).

The reference's kernel config is *consumed* by codegen: the cached-operand
list drives AttentionKernel+Caching.swift:18-281 and the register precisions
drive every cast (Precisions.swift:140-212). These tests assert our
equivalents are functional, not decorative:

- vmem_resident changes the traced kernel (Q-slab residency strategy),
- PrecisionPolicy.register drives the P/dS MXU-input casts,
- low_precision_intermediates drives the O memory dtype.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.kernels import flash_bwd, flash_fwd
from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.ops.descriptors import (
    AttentionDescriptor,
    AttentionKernelType,
    round_up,
)
from mfa_tpu.ops.precision import (
    AttentionOperand,
    OperandPrecision,
    make_precision_policy,
)
from mfa_tpu.ops.reference import attention_reference
from mfa_tpu.utils.testing import assert_close, make_attention_inputs


def _fwd_jaxpr(kd, r=128, c=256, d=128):
    d_pad = round_up(d, 128)
    fn = flash_fwd.build_fwd(
        kd, batch_heads=2, kv_batch_heads=2, seq_len_q=r, seq_len_kv=c,
        d_pad=d_pad, scale=0.125, q_dtype=jnp.bfloat16,
        kv_dtype=jnp.bfloat16, o_dtype=jnp.bfloat16, interpret=True)
    q = jax.ShapeDtypeStruct((2, r, d_pad), jnp.bfloat16)
    k = jax.ShapeDtypeStruct((2, c, d_pad), jnp.bfloat16)
    return str(jax.make_jaxpr(fn)(q, k, k))


def _base_kd():
    desc = AttentionDescriptor(
        batch=1, num_q_heads=2, num_kv_heads=2, seq_len_q=128,
        seq_len_kv=256, head_dim=128, low_precision_inputs=True)
    return desc.kernel_descriptor(AttentionKernelType.FORWARD)


def test_vmem_resident_changes_kernel():
    """Deleting the table row's operand list must change the compiled
    kernel (Q-slab residency vs per-d-block rescale)."""
    kd = _base_kd()
    assert "Q" in kd.vmem_resident           # the bf16 D=128 row caches Q
    kd_stream = dataclasses.replace(kd, vmem_resident=())
    assert _fwd_jaxpr(kd) != _fwd_jaxpr(kd_stream)


def test_vmem_resident_numerics_equivalent(rng):
    """Both residency strategies compute the same attention (policy is a
    perf/VMEM trade, not a semantics change)."""
    q, k, v, _ = make_attention_inputs(rng, 1, 2, 2, 100, 200, 64,
                                       dtype=jnp.bfloat16)
    kd = _base_kd()
    kd_stream = dataclasses.replace(kd, vmem_resident=())
    d_pad = 128

    def run(kdx):
        fn = flash_fwd.build_fwd(
            kdx, batch_heads=2, kv_batch_heads=2, seq_len_q=100,
            seq_len_kv=200, d_pad=d_pad, scale=0.125,
            q_dtype=jnp.bfloat16, kv_dtype=jnp.bfloat16,
            o_dtype=jnp.bfloat16, interpret=True)
        pad = lambda x, s: jnp.pad(
            x.reshape(2, x.shape[2], 64),
            ((0, 0), (0, s - x.shape[2]), (0, d_pad - 64)))
        bq, bkv = kdx.block_q, kdx.block_kv
        r_pad = -(-100 // bq) * bq
        c_pad = -(-200 // bkv) * bkv
        o, _ = fn(pad(q, r_pad), pad(k, c_pad), pad(v, c_pad))
        return o[:, :100, :64]

    assert_close(run(kd), run(kd_stream), 3e-3, "resident vs streamed Q")


def test_register_precision_drives_p_cast():
    """PrecisionPolicy.register[P] FP32 vs BF16 must change the kernel (the
    PV matmul consumes a differently-cast P)."""
    kd = _base_kd()
    assert kd.p_register is OperandPrecision.BF16
    kd_fp32 = dataclasses.replace(kd, p_register=OperandPrecision.FP32)
    j_bf16 = _fwd_jaxpr(kd)
    j_fp32 = _fwd_jaxpr(kd_fp32)
    assert j_bf16 != j_fp32


def test_register_precision_drives_ds_cast(rng):
    """ds_register FP32 vs BF16 changes the bwd_q kernel and tightens dQ."""
    kd_desc = AttentionDescriptor(
        batch=1, num_q_heads=1, num_kv_heads=1, seq_len_q=128,
        seq_len_kv=128, head_dim=128, low_precision_inputs=True)
    kd = kd_desc.kernel_descriptor(AttentionKernelType.BACKWARD_QUERY)
    kd_fp32 = dataclasses.replace(kd, ds_register=OperandPrecision.FP32)

    def jx(kdx):
        fn = flash_bwd.build_bwd_query(
            kdx, batch_heads=1, kv_batch_heads=1, seq_len_q=128,
            seq_len_kv=128, d_pad=128, scale=0.125,
            q_dtype=jnp.bfloat16, kv_dtype=jnp.bfloat16, interpret=True)
        x = jax.ShapeDtypeStruct((1, 128, 128), jnp.bfloat16)
        l = jax.ShapeDtypeStruct((1, 128, flash_fwd.LANES), jnp.float32)
        return str(jax.make_jaxpr(fn)(x, x, x, x, x, l))

    assert jx(kd) != jx(kd_fp32)


def test_policy_register_defaults():
    """The policy's register rules resolve as documented: BF16 P/dS for low-
    precision inputs, FP32 otherwise (Precisions.swift:197-212 recast)."""
    lo = make_precision_policy(low_precision_inputs=True)
    hi = make_precision_policy(low_precision_inputs=False)
    assert lo.reg(AttentionOperand.P) is OperandPrecision.BF16
    assert lo.reg(AttentionOperand.dS) is OperandPrecision.BF16
    assert hi.reg(AttentionOperand.P) is OperandPrecision.FP32
    assert hi.reg(AttentionOperand.dS) is OperandPrecision.FP32


def test_low_precision_intermediates_drives_o_dtype(rng):
    """The O-memory rule: lpi=False forces FP32 O in HBM even for BF16
    inputs; default (None) follows the input class; True keeps 16-bit."""
    q, k, v, _ = make_attention_inputs(rng, 1, 1, 1, 64, 64, 64,
                                       dtype=jnp.bfloat16)
    o_default = flash_attention(q, k, v)
    o_fp32 = flash_attention(q, k, v, low_precision_intermediates=False)
    o_lo = flash_attention(q, k, v, low_precision_intermediates=True)
    assert o_default.dtype == jnp.bfloat16
    assert o_lo.dtype == jnp.bfloat16
    assert o_fp32.dtype == jnp.float32

    want, _ = attention_reference(q, k, v)
    assert_close(o_fp32, want, 5e-2, "O fp32-memory path")
    # The fp32 O skips the final bf16 rounding → strictly at least as close.
    err32 = np.max(np.abs(np.asarray(o_fp32, np.float32) - np.asarray(want)))
    err16 = np.max(np.abs(np.asarray(o_default, np.float32) - np.asarray(want)))
    assert err32 <= err16 + 1e-6
