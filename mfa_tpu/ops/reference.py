"""Pure-jnp golden reference: attention forward + analytic gradients.

Port of the reference's CPU oracle (Tests/FlashAttentionTests/Utilities/
Network.swift) to JAX, generalized to batch/multi-head/GQA/causal:

- ``inference_attention`` (Network.swift:286-311, 151-179) →
  :func:`attention_reference`
- ``createLTerm`` / ``createDTerm`` (Network.swift:181-203, 259-281) →
  the L (logsumexp) and D (rowsum dO·O) terms returned here
- ``derivativeV/K/Q`` via explicit dS (Network.swift:329-402) →
  :func:`attention_grads_reference`
- loss Φ = Σ dO⊙O validating the gradient definition (Network.swift:314-326)
  → :func:`phi_loss` (used by the finite-difference test)

Unlike the reference (which stores L = m + log2(l), base-2), this framework
defines L as the natural-log logsumexp of the scaled scores; the kernels and
oracle agree on that convention.

Everything here runs on the CPU backend in float32/float64 — it is the "fake
backend" the reference lacks (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _expand_kv(x: jnp.ndarray, num_q_heads: int) -> jnp.ndarray:
    """Broadcast KV heads to Q heads for GQA. x: [B, Hkv, S, D]."""
    b, hkv, s, d = x.shape
    if hkv == num_q_heads:
        return x
    group = num_q_heads // hkv
    return jnp.repeat(x, group, axis=1)


def _scores(q, k, scale, causal, logit_soft_cap, sliding_window=None):
    s = jnp.einsum("bhrd,bhcd->bhrc", q.astype(jnp.float32),
                   k.astype(jnp.float32), precision=_HI)
    s = s * scale
    if logit_soft_cap is not None:
        s = logit_soft_cap * jnp.tanh(s / logit_soft_cap)
    if causal or sliding_window is not None:
        r, c = s.shape[-2], s.shape[-1]
        # Align diagonals to the end: query i attends to keys <= i + (c - r).
        row = jnp.arange(r)[:, None]
        col = jnp.arange(c)[None, :]
        mask = col <= row + (c - r)
        if sliding_window is not None:
            # Window of W keys ending at the diagonal (Mistral-style SWA).
            mask &= col >= row + (c - r) - (sliding_window - 1)
        s = jnp.where(mask, s, -jnp.inf)
    return s


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    causal: bool = False,
    logit_soft_cap: float | None = None,
    sliding_window: int | None = None,
):
    """Numerically-stable reference attention.

    Args:
      q: [B, Hq, R, D]; k, v: [B, Hkv, C, D] (Hkv divides Hq — GQA).
    Returns:
      (O [B, Hq, R, D] float32, L [B, Hq, R] float32) where
      L = logsumexp(scores) per row — the reference's L term
      (Network.swift:181-203) in natural log.
    """
    if scale is None:
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    hq = q.shape[1]
    k = _expand_kv(k, hq)
    v = _expand_kv(v, hq)
    s = _scores(q, k, scale, causal, logit_soft_cap, sliding_window)
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # fully-masked rows
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhrc,bhcd->bhrd", p, v.astype(jnp.float32),
                   precision=_HI) / jnp.maximum(l, 1e-37)
    lse = (m + jnp.log(jnp.maximum(l, 1e-37)))[..., 0]
    return o, lse


def attention_grads_reference(
    q, k, v, d_o,
    scale: float | None = None,
    causal: bool = False,
    logit_soft_cap: float | None = None,
    sliding_window: int | None = None,
):
    """Analytic dQ/dK/dV via explicit dS rows (Network.swift:329-402).

    Returns (dQ, dK, dV, D_term) — D_term = rowsum(dO ⊙ O)
    (Network.swift:259-281), which the backward_query kernel also computes.
    GQA: dK/dV are sum-reduced over each KV head's query group.
    """
    if scale is None:
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    hq, hkv = q.shape[1], k.shape[1]
    kx = _expand_kv(k, hq).astype(jnp.float32)
    vx = _expand_kv(v, hq).astype(jnp.float32)
    qf = q.astype(jnp.float32)
    dof = d_o.astype(jnp.float32)

    s_raw = jnp.einsum("bhrd,bhcd->bhrc", qf, kx, precision=_HI) * scale
    if logit_soft_cap is not None:
        t = jnp.tanh(s_raw / logit_soft_cap)
        s = logit_soft_cap * t
        cap_grad = 1.0 - t * t  # d(softcap)/d(s_raw) per element
    else:
        s = s_raw
        cap_grad = None
    if causal or sliding_window is not None:
        r, c = s.shape[-2], s.shape[-1]
        row = jnp.arange(r)[:, None]
        col = jnp.arange(c)[None, :]
        mask = col <= row + (c - r)
        if sliding_window is not None:
            mask &= col >= row + (c - r) - (sliding_window - 1)
        s = jnp.where(mask, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-37)
    p = e / l
    o = jnp.einsum("bhrc,bhcd->bhrd", p, vx, precision=_HI)

    d_term = jnp.sum(dof * o, axis=-1)  # [B, Hq, R]
    dp = jnp.einsum("bhrd,bhcd->bhrc", dof, vx, precision=_HI)
    ds = p * (dp - d_term[..., None])  # d/dS of softmax·V loss
    if cap_grad is not None:
        ds = ds * cap_grad
    ds = ds * scale

    dq = jnp.einsum("bhrc,bhcd->bhrd", ds, kx, precision=_HI)
    dk_full = jnp.einsum("bhrc,bhrd->bhcd", ds, qf, precision=_HI)
    dv_full = jnp.einsum("bhrc,bhrd->bhcd", p, dof, precision=_HI)
    if hkv != hq:
        group = hq // hkv
        b = q.shape[0]
        dk = dk_full.reshape(b, hkv, group, *dk_full.shape[2:]).sum(axis=2)
        dv = dv_full.reshape(b, hkv, group, *dv_full.shape[2:]).sum(axis=2)
    else:
        dk, dv = dk_full, dv_full
    return dq, dk, dv, d_term


def phi_loss(q, k, v, d_o, **kw):
    """Φ = Σ dO ⊙ O — the scalar loss whose gradient w.r.t. (q, k, v) is
    exactly (dQ, dK, dV) above (Network.swift:314-326). Used by the
    finite-differencing test to validate the analytic gradients."""
    o, _ = attention_reference(q, k, v, **kw)
    return jnp.sum(d_o.astype(jnp.float32) * o)
