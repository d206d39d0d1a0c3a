"""Ulysses-style context parallelism: all-to-all head↔sequence swap.

The optional alternative CP mode from SURVEY.md §2.4: instead of rotating
KV around a ring, one all-to-all on ICI exchanges the sequence sharding for
a head sharding, every device runs full-sequence attention on its subset of
heads with the single-chip flash kernel, and a second all-to-all swaps
back. Cheaper than ring when heads >= devices and the sequence fits HBM;
ring wins for extreme context lengths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mfa_tpu.ops.attention import flash_attention


def ulysses_attention(
    q, k, v, *, axis_name: str = "sp", causal: bool = False,
    scale: float | None = None, interpret: bool | None = None,
):
    """Call inside shard_map; q/k/v are local sequence chunks [B, H, T_loc, D]
    with both H and the KV head count divisible by the axis size. Returns
    the local O chunk.

    Differentiable end to end: ``all_to_all`` transposes to the inverse
    all_to_all and ``flash_attention`` carries the two-kernel custom VJP, so
    ``jax.grad`` through this function runs the full Ulysses backward
    (locked by tests/test_aux.py::test_ulysses_backward_matches_oracle).
    """
    n = jax.lax.axis_size(axis_name)
    for name, x in (("q", q), ("kv", k)):
        if x.shape[1] % n != 0:
            raise ValueError(
                f"{name} heads ({x.shape[1]}) must divide over axis size {n}")

    def seq_to_head(x):
        # [B, H, T_loc, D] → all-to-all → [B, H/n, T_loc*n, D]
        # split heads into n groups; exchange group axis with the device
        # axis, concatenating the sequence chunks.
        b, h, t, d = x.shape
        x = x.reshape(b, n, h // n, t, d)
        x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0,
                               tiled=False)
        # [n(seq chunks), B, h/n, t, d] → [B, h/n, n*t, d]
        x = jnp.moveaxis(x, 0, 2)            # [B, h/n, n, t, d]
        return x.reshape(b, h // n, n * t, d)

    def head_to_seq(x):
        # inverse of seq_to_head for O
        b, hn, nt, d = x.shape
        t = nt // n
        x = x.reshape(b, hn, n, t, d)
        x = jnp.moveaxis(x, 2, 0)            # [n, B, h/n, t, d]
        x = jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=1,
                               tiled=False)
        return x.reshape(b, hn * n, t, d)

    qg = seq_to_head(q)
    kg = seq_to_head(k)
    vg = seq_to_head(v)
    og = flash_attention(qg, kg, vg, causal=causal, scale=scale,
                         interpret=interpret)
    return head_to_seq(og)


def choose_cp_mode(
    num_q_heads: int,
    num_kv_heads: int,
    seq_len: int,
    head_dim: int,
    n_devices: int,
    *,
    hbm_budget_bytes: int = 12 * 2**30,
    in_bytes: int = 2,
    batch: int = 1,
) -> str:
    """Crossover rule between the two context-parallel modes.

    Comm volume per device (size = one operand's local bytes):
      - Ulysses: 4 all-to-alls (Q, K, V, O), each moving (n−1)/n of its
        operand → ≈ 4·size·(n−1)/n.
      - Ring: (n−1) rotation steps × 2 operands (K, V) → 2·size·(n−1)
        forward, ~2× more backward (traveling dK/dV accumulators).
    So Ulysses is ~n/2× cheaper on the wire whenever it is shape-legal.
    Ring remains the only option when:
      - heads don't divide over the devices (GQA with few KV heads — an
        all-to-all would have to replicate KV), or
      - the full sequence's K/V (+ flash working set) for one head-shard
        doesn't fit the per-device HBM budget (extreme context lengths —
        Ulysses needs the WHOLE sequence on-device, ring only 1/n of it).

    Returns "ulysses" or "ring".
    """
    heads_divide = (num_q_heads % n_devices == 0
                    and num_kv_heads % n_devices == 0)
    if not heads_divide:
        return "ring"
    # Full-sequence working set per device after the head swap: Q/K/V/O for
    # num_*_heads/n heads over the whole sequence.
    hq = num_q_heads // n_devices
    hkv = num_kv_heads // n_devices
    full_seq_bytes = batch * seq_len * head_dim * in_bytes * (
        2 * hq + 2 * hkv)
    if full_seq_bytes > hbm_budget_bytes:
        return "ring"
    return "ulysses"


def make_ulysses_attention(mesh, *, causal: bool = False, scale=None,
                           interpret: bool | None = None,
                           axis_name: str = "sp"):
    """shard_map wrapper over global [B, H, S, D] arrays with S sharded on
    ``axis_name`` (mirror of make_ring_attention)."""
    from jax.sharding import PartitionSpec as P

    spec = P("dp", "tp", axis_name, None)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    def fn(q, k, v):
        return ulysses_attention(q, k, v, axis_name=axis_name, causal=causal,
                                 scale=scale, interpret=interpret)

    return fn
