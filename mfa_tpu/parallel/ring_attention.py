"""Ring attention: sequence-parallel flash attention over an ICI ring.

The direct generalization of the reference's streaming traversal loop
(AttentionKernel+Source.swift:176-199) to multiple chips (SURVEY.md §2.4):
KV is sharded along the sequence axis; each step every device runs the
local flash kernel against the KV chunk it currently holds, then rotates
the chunk to its ring neighbor with ``ppermute``. The per-chunk online-
softmax partials (O, L) are merged with exactly the reference's rescaling
identity (AttentionKernel+Softmax.swift:289-324) lifted from block level to
chunk level:

    L   = log(exp L1 + exp L2)
    O   = O1·exp(L1−L) + O2·exp(L2−L)

Causal handling classifies whole chunks (the chunk-level analogue of the
causal block skip): source chunk < mine → unmasked; == mine → local causal;
> mine → skipped entirely.

Differentiable: the custom VJP runs the ring a second time, rotating
(K, V, dK-acc, dV-acc) together. Each step computes this chunk's additive
gradient contribution under the GLOBAL softmax via
ops.attention.attention_chunk_grads (the two-kernel atomics-free backward
with externally supplied O/LSE); after n rotations each chunk arrives home
carrying its fully-summed dK/dV, while dQ accumulates locally. This is the
multi-chip lift of the reference's backward traversal loops
(AttentionKernel+Source.swift:202-293).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mfa_tpu.ops.attention import attention_chunk_grads, flash_attention


@dataclass(frozen=True)
class _RingConfig:
    axis_name: str
    causal: bool
    scale: float | None
    interpret: bool | None


def _merge(o1, lse1, o2, lse2):
    """Merge two online-softmax partials (fp32). Handles -inf lse (empty
    contributions) without NaN."""
    m = jnp.maximum(lse1, lse2)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w1 = jnp.exp(lse1 - m_safe)
    w2 = jnp.exp(lse2 - m_safe)
    denom = w1 + w2
    denom_safe = jnp.maximum(denom, 1e-37)
    o = (o1 * w1[..., None] + o2 * w2[..., None]) / denom_safe[..., None]
    lse = m_safe + jnp.log(denom_safe)
    lse = jnp.where(jnp.isfinite(m), lse, -jnp.inf)
    return o, lse


def _rotate(x, axis_name, n):
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def _ring_forward(q, k, v, cfg: _RingConfig):
    n = jax.lax.axis_size(cfg.axis_name)
    my = jax.lax.axis_index(cfg.axis_name)
    b, h, t, d = q.shape

    def local_attn(kc, vc, local_causal: bool):
        o, lse = flash_attention(
            q, kc, vc, causal=local_causal, scale=cfg.scale,
            interpret=cfg.interpret, with_lse=True,
        )
        return o.astype(jnp.float32), lse

    def step(carry, s):
        o_acc, lse_acc, kc, vc = carry
        src = (my - s) % n               # owner of the chunk we now hold

        # Double-buffered rotation: issue the ppermute of the chunk we
        # already hold BEFORE computing on it. The permuted values (kn, vn)
        # have no data dependency on the attention below, so XLA's async
        # collective-permute + latency-hiding scheduler can run the transfer
        # under the compute — step time → max(compute, transfer), not the
        # sum (SURVEY hard-part 4; enable the flags in
        # parallel.multihost.ICI_OVERLAP_XLA_FLAGS on real slices).
        kn = _rotate(kc, cfg.axis_name, n)
        vn = _rotate(vc, cfg.axis_name, n)

        if cfg.causal:
            def full(_):
                return local_attn(kc, vc, False)

            def diag(_):
                return local_attn(kc, vc, True)

            def skip(_):
                return (jnp.zeros((b, h, t, d), jnp.float32),
                        jnp.full((b, h, t), -jnp.inf, jnp.float32))

            branch = jnp.int32(0) + (src == my) + 2 * (src > my)
            o_p, lse_p = jax.lax.switch(branch, [full, diag, skip], None)
        else:
            o_p, lse_p = local_attn(kc, vc, False)

        o_acc, lse_acc = _merge(o_acc, lse_acc, o_p, lse_p)
        return (o_acc, lse_acc, kn, vn), None

    o0 = jnp.zeros((b, h, t, d), jnp.float32)
    lse0 = jnp.full((b, h, t), -jnp.inf, jnp.float32)
    (o, lse, _, _), _ = jax.lax.scan(
        step, (o0, lse0, k, v), jnp.arange(n), length=n
    )
    return o.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ring(q, k, v, cfg: _RingConfig):
    return _ring_forward(q, k, v, cfg)[0]


def _ring_fwd_rule(q, k, v, cfg):
    o, lse = _ring_forward(q, k, v, cfg)
    return o, (q, k, v, o, lse)


def _ring_bwd_rule(cfg, res, g):
    q, k, v, o, lse = res
    n = jax.lax.axis_size(cfg.axis_name)
    my = jax.lax.axis_index(cfg.axis_name)

    def chunk_grads(kc, vc, local_causal: bool):
        dq_c, dk_c, dv_c = attention_chunk_grads(
            q, kc, vc, o, g, lse, causal=local_causal, scale=cfg.scale,
            interpret=cfg.interpret,
        )
        return (dq_c.astype(jnp.float32), dk_c.astype(jnp.float32),
                dv_c.astype(jnp.float32))

    # Traveling-accumulator precision: fp32 inputs keep the 1e-5 ring-parity
    # budget; bf16/fp16 inputs travel their dK/dV partial sums in bf16 —
    # halving the backward's extra comm volume (round-1 VERDICT item 6: the
    # fp32 accumulators tripled ring traffic). Per-hop rounding of same-
    # magnitude partial sums adds ~sqrt(n)·2^-8 relative error, well inside
    # the 5e-2 mixed budget (locked by tests/test_ring_bwd.py bf16 case).
    travel_dtype = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16

    def step(carry, s):
        kc, vc, dk_acc, dv_acc, dq_acc = carry
        src = (my - s) % n

        # Overlap structure (two different windows):
        # - K/V rotate BEFORE the compute: their transfer hides under THIS
        #   step's two backward kernels (kn/vn are only read next step).
        # - dK/dV accumulators must absorb this step's contribution first
        #   (they travel WITH their chunk), so they rotate after the add —
        #   but nothing in the NEXT step reads them until its own final
        #   add, so their transfer hides under the next step's compute.
        # Net: every ppermute has a full compute step to complete.
        kn = _rotate(kc, cfg.axis_name, n)
        vn = _rotate(vc, cfg.axis_name, n)

        if cfg.causal:
            def full(_):
                return chunk_grads(kc, vc, False)

            def diag(_):
                return chunk_grads(kc, vc, True)

            def skip(_):
                return (jnp.zeros_like(dq_acc),
                        jnp.zeros(k.shape, jnp.float32),
                        jnp.zeros(k.shape, jnp.float32))

            branch = jnp.int32(0) + (src == my) + 2 * (src > my)
            dq_c, dk_c, dv_c = jax.lax.switch(branch, [full, diag, skip],
                                              None)
        else:
            dq_c, dk_c, dv_c = chunk_grads(kc, vc, False)

        dq_acc = dq_acc + dq_c
        # fp32 add of this chunk's contribution, then travel-dtype cast for
        # the wire; after n hops the accumulator arrives home fully summed.
        dk_acc = (dk_acc.astype(jnp.float32) + dk_c).astype(travel_dtype)
        dv_acc = (dv_acc.astype(jnp.float32) + dv_c).astype(travel_dtype)
        dk_acc = _rotate(dk_acc, cfg.axis_name, n)
        dv_acc = _rotate(dv_acc, cfg.axis_name, n)
        return (kn, vn, dk_acc, dv_acc, dq_acc), None

    zeros_kv = jnp.zeros(k.shape, travel_dtype)
    zeros_q = jnp.zeros(q.shape, jnp.float32)
    (kc, vc, dk, dv, dq), _ = jax.lax.scan(
        step, (k, v, zeros_kv, zeros_kv, zeros_q), jnp.arange(n), length=n
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring.defvjp(_ring_fwd_rule, _ring_bwd_rule)


def ring_flash_attention(
    q,
    k,
    v,
    *,
    axis_name: str = "sp",
    causal: bool = False,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Sequence-parallel attention; call inside shard_map with the sequence
    axis of q/k/v sharded over ``axis_name``.

    q, k, v: the LOCAL chunks [B, H, T_local, D] (equal chunk sizes).
    Returns the local chunk of O. Chunks are assumed laid out in ring
    order: global position = axis_index * T_local + local position.
    Differentiable (ring backward rotating dK/dV accumulators).
    """
    cfg = _RingConfig(axis_name=axis_name, causal=causal, scale=scale,
                      interpret=interpret)
    return _ring(q, k, v, cfg)


def make_ring_attention(mesh, *, causal: bool = False, scale=None,
                        interpret: bool | None = None,
                        axis_name: str = "sp"):
    """shard_map-wrapped ring attention: takes GLOBAL [B, H, S, D] arrays
    with S sharded over ``axis_name``; dp/tp axes shard batch/heads."""
    from jax.sharding import PartitionSpec as P

    spec = P("dp", "tp", axis_name, None)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def fn(q, k, v):
        return ring_flash_attention(
            q, k, v, axis_name=axis_name, causal=causal, scale=scale,
            interpret=interpret,
        )

    return fn
