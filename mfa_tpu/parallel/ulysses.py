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
    with H divisible by the axis size. Returns the local O chunk."""
    n = jax.lax.axis_size(axis_name)
    b, h, t, d = q.shape
    if h % n != 0:
        raise ValueError(f"heads ({h}) must divide over axis size {n}")

    def seq_to_head(x):
        # [B, H, T_loc, D] → all-to-all → [B, H/n, T_loc*n, D]
        # split heads into n groups; exchange group axis with the device
        # axis, concatenating the sequence chunks.
        x = x.reshape(b, n, h // n, t, d)
        x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0,
                               tiled=False)
        # [n(seq chunks), B, h/n, t, d] → [B, h/n, n*t, d]
        x = jnp.moveaxis(x, 0, 2)            # [B, h/n, n, t, d]
        return x.reshape(b, h // n, n * t, d)

    def head_to_seq(x):
        # inverse of seq_to_head for O
        x = x.reshape(b, h // n, n, t, d)
        x = jnp.moveaxis(x, 2, 0)            # [n, B, h/n, t, d]
        x = jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=1,
                               tiled=False)
        return x.reshape(b, h, t, d)

    qg = seq_to_head(q)
    kg = seq_to_head(k)
    vg = seq_to_head(v)
    og = flash_attention(qg, kg, vg, causal=causal, scale=scale,
                         interpret=interpret)
    return head_to_seq(og)


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
