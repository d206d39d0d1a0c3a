"""Finite-difference validation of the custom-VJP gradients.

Independent of ops/reference.py's analytic derivation — a shared derivation
error between the kernel and the oracle would pass every analytic-parity
test; the central difference of the scalar loss only trusts the FORWARD
pass. The reference kept the same safeguard
(Documentation/Archive/FiniteDifferencingTest.swift).

Loss = sum(dO * O) — the Phi = sum dO.O trick (Network.swift:314-326): its
gradient wrt (q, k, v) is exactly what the backward kernels compute for
cotangent dO.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.ops.attention import flash_attention


def _loss_fn(do, **kw):
    def loss(q, k, v):
        o = flash_attention(q, k, v, **kw)
        return jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32))
    return loss


def _directional_check(rng, loss, q, k, v, n_dirs=4, eps=2e-3, rtol=2e-2):
    """Central difference along random unit directions vs <grad, u>.

    fp32 end to end (x64 is off): eps ~ 2e-3 balances truncation (O(eps^2))
    against fp32 cancellation in loss(+) - loss(-); the comparison is
    relative to the gradient-norm scale of the problem.
    """
    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    scale = float(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in grads)
                  ) ** 0.5
    for _ in range(n_dirs):
        dirs = []
        norm2 = 0.0
        for x in (q, k, v):
            u = rng.standard_normal(x.shape).astype(np.float32)
            norm2 += float((u ** 2).sum())
            dirs.append(u)
        norm = norm2 ** 0.5
        dirs = [jnp.asarray(u / norm) for u in dirs]

        plus = loss(*(x + eps * u for x, u in zip((q, k, v), dirs)))
        minus = loss(*(x - eps * u for x, u in zip((q, k, v), dirs)))
        fd = (float(plus) - float(minus)) / (2.0 * eps)
        analytic = float(sum(jnp.sum(g * u) for g, u in zip(grads, dirs)))
        # |analytic| can be << scale for an unlucky direction; normalize by
        # the full gradient norm so the tolerance has stable meaning.
        assert abs(fd - analytic) <= rtol * max(scale, 1e-6), (
            f"directional derivative mismatch: fd={fd:.6g} "
            f"analytic={analytic:.6g} (grad scale {scale:.3g})")


@pytest.mark.parametrize("kw", [
    {},                                        # plain
    {"causal": True},                          # causal masking path
    {"logit_soft_cap": 8.0},                   # softcap (tanh) path
    {"sliding_window": 16, "causal": True},    # banded path
])
def test_finite_difference_fp32(rng, kw):
    b, hq, hkv, r, c, d = 1, 2, 1, 24, 32, 32
    q = jnp.asarray(rng.standard_normal((b, hq, r, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, c, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, c, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((b, hq, r, d)), jnp.float32)
    _directional_check(rng, _loss_fn(do, **kw), q, k, v)
