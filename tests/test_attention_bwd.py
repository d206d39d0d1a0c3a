"""Two-kernel backward pass vs analytic oracle gradients.

Mirrors the reference's gradient validation (SquareAttentionTest.swift
correctness sweep over all three kernels; Network.swift analytic grads)."""

import jax
import jax.numpy as jnp
import pytest

from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.ops.reference import attention_grads_reference
from mfa_tpu.utils.testing import assert_close, make_attention_inputs


def _grads(q, k, v, do, **kw):
    def loss(q, k, v):
        o = flash_attention(q, k, v, **kw)
        return jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32))

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


SHAPES = [
    (64, 64, 32),
    (100, 120, 32),     # unaligned edges
    (129, 257, 64),
]


@pytest.mark.parametrize("r,c,d", SHAPES)
def test_bwd_fp32(rng, r, c, d):
    q, k, v, do = make_attention_inputs(rng, 1, 1, 1, r, c, d)
    dq, dk, dv = _grads(q, k, v, do)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do)
    assert_close(dq, wq, 3e-5, f"dQ ({r},{c},{d})")
    assert_close(dk, wk, 3e-5, f"dK ({r},{c},{d})")
    assert_close(dv, wv, 3e-5, f"dV ({r},{c},{d})")


def test_bwd_causal(rng):
    q, k, v, do = make_attention_inputs(rng, 1, 2, 2, 96, 160, 32)
    dq, dk, dv = _grads(q, k, v, do, causal=True)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do, causal=True)
    assert_close(dq, wq, 3e-5, "dQ causal")
    assert_close(dk, wk, 3e-5, "dK causal")
    assert_close(dv, wv, 3e-5, "dV causal")


def test_bwd_gqa(rng):
    """GQA: dK/dV accumulate over the query-head group inside the
    column-parallel kernel (no atomics)."""
    q, k, v, do = make_attention_inputs(rng, 1, 4, 2, 64, 64, 32)
    dq, dk, dv = _grads(q, k, v, do)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do)
    assert_close(dq, wq, 3e-5, "dQ GQA")
    assert_close(dk, wk, 3e-5, "dK GQA")
    assert_close(dv, wv, 3e-5, "dV GQA")


def test_bwd_bf16(rng):
    q, k, v, do = make_attention_inputs(rng, 1, 1, 1, 128, 128, 64,
                                        dtype=jnp.bfloat16)
    dq, dk, dv = _grads(q, k, v, do)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do)
    # Mixed-precision error budget <= 5e-2 (Precisions.swift:28-35).
    assert_close(dq, wq, 5e-2, "dQ bf16")
    assert_close(dk, wk, 5e-2, "dK bf16")
    assert_close(dv, wv, 5e-2, "dV bf16")


def test_bwd_soft_cap(rng):
    q, k, v, do = make_attention_inputs(rng, 1, 1, 1, 64, 96, 32)
    dq, dk, dv = _grads(q, k, v, do, logit_soft_cap=8.0)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do, logit_soft_cap=8.0)
    assert_close(dq, wq, 5e-5, "dQ softcap")
    assert_close(dk, wk, 5e-5, "dK softcap")
    assert_close(dv, wv, 5e-5, "dV softcap")


def test_bwd_d_blocked(rng):
    """D > 128 exercises the d-blocked accumulator paging."""
    q, k, v, do = make_attention_inputs(rng, 1, 1, 1, 64, 64, 160)
    dq, dk, dv = _grads(q, k, v, do)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do)
    assert_close(dq, wq, 5e-5, "dQ D=160")
    assert_close(dk, wk, 5e-5, "dK D=160")
    assert_close(dv, wv, 5e-5, "dV D=160")


def test_bwd_d_blocked_large(rng):
    """D=384 — the reference's large-D headline class (README.md:13);
    3-block accumulator paging through both backward kernels."""
    q, k, v, do = make_attention_inputs(rng, 1, 1, 1, 48, 64, 384)
    dq, dk, dv = _grads(q, k, v, do)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do)
    assert_close(dq, wq, 5e-5, "dQ D=384")
    assert_close(dk, wk, 5e-5, "dK D=384")
    assert_close(dv, wv, 5e-5, "dV D=384")


def test_bwd_causal_tablegrid_matches_blockskip(rng):
    """The compressed-grid causal schedule (tablegrid) is a scheduling
    strategy, not semantics: both backward kernels must produce gradients
    bitwise-identical to blockskip (same live blocks, same j order)."""
    import dataclasses

    import numpy as np

    from mfa_tpu.ops import attention as attn_mod
    from mfa_tpu.ops.descriptors import AttentionKernelType

    q, k, v, do = make_attention_inputs(rng, 1, 4, 2, 300, 520, 64,
                                        dtype=jnp.bfloat16)

    def grads(mode):
        cfg = attn_mod._AttnConfig(causal=True, scale=None,
                                   logit_soft_cap=None, sliding_window=None,
                                   interpret=True)
        desc = attn_mod._descriptor(q, k, v, cfg)
        outs = {}
        import mfa_tpu.ops.descriptors as dmod
        orig = dmod.AttentionDescriptor.kernel_descriptor

        def patched(self, ktype, generation=None):
            return dataclasses.replace(orig(self, ktype, generation),
                                       causal_mode=mode)

        dmod.AttentionDescriptor.kernel_descriptor = patched
        try:
            attn_mod.attention_cache.clear()
            def loss(q, k, v):
                o = attn_mod.flash_attention(q, k, v, causal=True,
                                             interpret=True)
                return jnp.sum(o.astype(jnp.float32)
                               * do.astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            dmod.AttentionDescriptor.kernel_descriptor = orig
            attn_mod.attention_cache.clear()

    g_bs = grads("blockskip")
    g_tg = grads("tablegrid")
    for name, a, b in zip(("dQ", "dK", "dV"), g_bs, g_tg):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=f"{name} tablegrid != blockskip")
