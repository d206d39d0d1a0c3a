"""Test utilities: random problem generation + tolerance checking.

Port of the reference's test fixtures:
- ``Network(descriptor:)`` random Q/K/V/dO generation (Network.swift:80-129)
- precision-aware tolerance model (SquareAttentionTest.swift:539-554,
  AdversarialShapeTest.swift:288-336)
- error reporting capped at a few entries (SquareAttentionTest.swift:527-534)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_attention_inputs(
    rng: np.random.Generator,
    batch: int,
    num_q_heads: int,
    num_kv_heads: int,
    seq_len_q: int,
    seq_len_kv: int,
    head_dim: int,
    dtype=jnp.float32,
):
    """Standard-normal Q/K/V/dO, the reference's Box-Muller fixture
    (Network.swift:80-129) via numpy."""
    def gen(h, s):
        return jnp.asarray(
            rng.standard_normal((batch, h, s, head_dim)), dtype=dtype
        )

    q = gen(num_q_heads, seq_len_q)
    k = gen(num_kv_heads, seq_len_kv)
    v = gen(num_kv_heads, seq_len_kv)
    do = gen(num_q_heads, seq_len_q)
    return q, k, v, do


def assert_close(actual, expected, tol: float, name: str = "operand",
                 max_report: int = 10):
    """Max-abs-error check with a capped error report, honoring the
    reference's NaN/Inf-agreement escape hatch
    (SquareAttentionTest.swift:521-524)."""
    a = np.asarray(actual, dtype=np.float32)
    e = np.asarray(expected, dtype=np.float32)
    assert a.shape == e.shape, f"{name}: shape {a.shape} != {e.shape}"
    both_nonfinite = ~np.isfinite(a) & ~np.isfinite(e)
    diff = np.abs(a - e)
    diff[both_nonfinite] = 0.0
    bad = diff > tol
    if bad.any():
        idx = np.argwhere(bad)[:max_report]
        lines = [
            f"  [{tuple(i)}] got {a[tuple(i)]:.6g} want {e[tuple(i)]:.6g} "
            f"(|Δ|={diff[tuple(i)]:.3g})"
            for i in idx
        ]
        raise AssertionError(
            f"{name}: {bad.sum()}/{a.size} elements exceed tol={tol:g} "
            f"(max |Δ|={diff.max():.3g}):\n" + "\n".join(lines)
        )


def nan_canary(shape, dtype=jnp.float32):
    """Output buffer pre-filled with NaN — catches kernels that silently
    never write (SquareAttentionTest.swift:286)."""
    return jnp.full(shape, jnp.nan, dtype=dtype)


def assert_fully_written(out, name: str = "output"):
    """NaN-output canary check: every element of a buffer initialized via
    :func:`nan_canary` (or any kernel output) must have been overwritten with
    a finite value. The TPU analogue of the reference's ``resultO[0] = .nan``
    probe (SquareAttentionTest.swift:286) — Pallas owns output allocation, so
    the check runs on the result instead of a prefilled buffer."""
    a = np.asarray(out, dtype=np.float32)
    bad = ~np.isfinite(a)
    if bad.any():
        idx = tuple(np.argwhere(bad)[0])
        raise AssertionError(
            f"{name}: {bad.sum()}/{a.size} elements never written or "
            f"non-finite (first at {idx})"
        )


def garbage_pad(x, s_pad: int, d_pad: int, rng: np.random.Generator):
    """Out-of-bounds canary padding (MTLContext+Buffers.swift:9-18): pad the
    sequence/head tail of a [N, S, D] operand with uniform garbage in
    [-20, 20] instead of zeros, so any kernel that reads past the declared
    problem bounds (wrong BlockSpec index map, missing edge mask) corrupts
    its outputs detectably instead of silently reading zeros."""
    n, s, d = x.shape
    if s == s_pad and d == d_pad:
        return x
    out = rng.uniform(-20.0, 20.0, size=(n, s_pad, d_pad))
    out = jnp.asarray(out, dtype=x.dtype)
    return out.at[:, :s, :d].set(x)
