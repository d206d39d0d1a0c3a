"""Oracle self-validation: analytic gradients vs autodiff and finite
differences — the role of the reference's archived FiniteDifferencingTest
(SURVEY.md §4) plus the Φ = Σ dO⊙O loss identity (Network.swift:314-326)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.ops.reference import (
    attention_grads_reference,
    attention_reference,
    phi_loss,
)
from mfa_tpu.utils.testing import assert_close, make_attention_inputs


@pytest.mark.parametrize("causal", [False, True])
def test_analytic_grads_match_autodiff(rng, causal):
    q, k, v, do = make_attention_inputs(rng, 1, 2, 2, 33, 47, 16)
    dq, dk, dv, _ = attention_grads_reference(q, k, v, do, causal=causal)
    gq, gk, gv = jax.grad(phi_loss, argnums=(0, 1, 2))(
        q, k, v, do, causal=causal
    )
    assert_close(dq, gq, 1e-4, "dQ")
    assert_close(dk, gk, 1e-4, "dK")
    assert_close(dv, gv, 1e-4, "dV")


def test_analytic_grads_match_autodiff_gqa(rng):
    q, k, v, do = make_attention_inputs(rng, 2, 4, 2, 17, 29, 8)
    dq, dk, dv, _ = attention_grads_reference(q, k, v, do)
    gq, gk, gv = jax.grad(phi_loss, argnums=(0, 1, 2))(q, k, v, do)
    assert_close(dq, gq, 1e-4, "dQ (GQA)")
    assert_close(dk, gk, 1e-4, "dK (GQA)")
    assert_close(dv, gv, 1e-4, "dV (GQA)")


def test_finite_difference(rng):
    """Central finite differences of Φ w.r.t. a few random q/k/v entries."""
    q, k, v, do = make_attention_inputs(rng, 1, 1, 1, 9, 13, 4)
    dq, dk, dv, _ = attention_grads_reference(q, k, v, do)
    eps = 1e-3

    def check(x, dx, which, n=5):
        flat = np.asarray(x).ravel()
        picks = rng.choice(flat.size, size=n, replace=False)
        for i in picks:
            bump = np.zeros_like(flat)
            bump[i] = eps
            bump = jnp.asarray(bump.reshape(x.shape))
            args = {"q": q, "k": k, "v": v}
            args[which] = x + bump
            fp = phi_loss(args["q"], args["k"], args["v"], do)
            args[which] = x - bump
            fm = phi_loss(args["q"], args["k"], args["v"], do)
            fd = (fp - fm) / (2 * eps)
            got = np.asarray(dx).ravel()[i]
            assert abs(fd - got) < 2e-2, (
                f"finite diff {which}[{i}]: fd={fd:.5f} analytic={got:.5f}"
            )

    check(q, dq, "q")
    check(k, dk, "k")
    check(v, dv, "v")


def test_soft_cap_grads(rng):
    q, k, v, do = make_attention_inputs(rng, 1, 1, 1, 11, 19, 8)
    dq, dk, dv, _ = attention_grads_reference(q, k, v, do, logit_soft_cap=5.0)
    gq, gk, gv = jax.grad(phi_loss, argnums=(0, 1, 2))(
        q, k, v, do, logit_soft_cap=5.0
    )
    assert_close(dq, gq, 1e-4, "dQ (softcap)")
    assert_close(dk, gk, 1e-4, "dK (softcap)")
    assert_close(dv, gv, 1e-4, "dV (softcap)")


def test_lse_definition(rng):
    """L must equal logsumexp of scaled scores."""
    q, k, v, _ = make_attention_inputs(rng, 1, 1, 1, 8, 12, 4)
    _, lse = attention_reference(q, k, v, scale=0.5)
    s = jnp.einsum("bhrd,bhcd->bhrc", q, k) * 0.5
    want = jax.scipy.special.logsumexp(s, axis=-1)
    assert_close(lse, want, 1e-5, "L")


def test_causal_alignment(rng):
    """Causal masking aligns diagonals to sequence ends (query r sees keys
    <= r + C - R)."""
    q, k, v, _ = make_attention_inputs(rng, 1, 1, 1, 4, 8, 4)
    o_causal, _ = attention_reference(q, k, v, causal=True)
    # Row R-1 (last query) sees all C keys — must equal non-causal last row.
    o_full, _ = attention_reference(q, k, v, causal=False)
    assert_close(o_causal[:, :, -1], o_full[:, :, -1], 1e-6, "last row")
