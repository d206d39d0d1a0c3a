"""Randomized property test: the RectangularAttentionTest analogue.

The reference runs 15 trials of random R != C, random D, random transposes,
random precision flags (RectangularAttentionTest.swift:7-35). Here: random
rectangular shapes, random GQA group, random dtype, random causal/soft-cap,
fwd + bwd vs oracle — shrunk to CPU-interpret scale but same spirit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.ops.reference import (
    attention_grads_reference,
    attention_reference,
)
from mfa_tpu.utils.testing import assert_close, make_attention_inputs

TRIALS = 8


@pytest.mark.parametrize("trial", range(TRIALS))
def test_random_rectangular(trial):
    rng = np.random.default_rng(1000 + trial)
    r = int(rng.integers(1, 200))
    c = int(rng.integers(1, 300))
    d = int(rng.integers(1, 80))
    hkv = int(rng.choice([1, 2]))
    group = int(rng.choice([1, 2, 4]))
    hq = hkv * group
    causal = bool(rng.integers(2)) and c >= r  # causal with R>C can mask all
    low = bool(rng.integers(2))
    cap = float(rng.choice([0.0, 12.0]))
    dtype = jnp.bfloat16 if low else jnp.float32
    soft_cap = cap if cap > 0 else None

    q, k, v, do = make_attention_inputs(rng, 1, hq, hkv, r, c, d, dtype)
    tol = 5e-2 if low else 3e-5

    o = flash_attention(q, k, v, causal=causal, logit_soft_cap=soft_cap)
    want, _ = attention_reference(q, k, v, causal=causal,
                                  logit_soft_cap=soft_cap)
    label = f"trial{trial} r={r} c={c} d={d} hq={hq}/{hkv} causal={causal} " \
            f"low={low} cap={soft_cap}"
    assert_close(o, want, tol, "O " + label)

    def loss(q, k, v):
        oo = flash_attention(q, k, v, causal=causal, logit_soft_cap=soft_cap)
        return jnp.sum(do.astype(jnp.float32) * oo.astype(jnp.float32))

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    wq, wk, wv, _ = attention_grads_reference(
        q, k, v, do, causal=causal, logit_soft_cap=soft_cap)
    # Gradient tolerances scale with accumulation length (the reference's
    # AdversarialShapeTest tolerance model).
    gtol = tol * max(1.0, (r * c) ** 0.25 / 4)
    assert_close(dq, wq, gtol, "dQ " + label)
    assert_close(dk, wk, gtol, "dK " + label)
    assert_close(dv, wv, gtol, "dV " + label)
