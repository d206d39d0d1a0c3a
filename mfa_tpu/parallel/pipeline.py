"""Pipeline parallelism: GPipe-style microbatch pipeline over a ``pp`` mesh
axis.

The reference is strictly single-device (SURVEY.md §2.4: pipeline parallel
"No"); this is the TPU-native equivalent built the SPMD way rather than the
point-to-point-send way: every stage runs the SAME jitted program under
``shard_map``, stage identity comes from ``lax.axis_index("pp")``, and
activations move stage→stage+1 with ``lax.ppermute`` over ICI — XLA overlaps
the permute with the next microbatch's compute, which is the entire
scheduling story (no host-side scheduler, no NCCL p2p).

Schedule: classic GPipe fill-drain. With ``S`` stages and ``M`` microbatches
the loop runs ``M + S - 1`` steps; at step ``t`` stage ``s`` processes
microbatch ``t - s`` (when ``0 <= t-s < M``), so the bubble fraction is
``(S-1)/(M+S-1)``. Stages compute unconditionally (on zeros when their slot
is empty — cheaper on TPU than predicating the matmuls) and the last stage
masks invalid slots when writing its output buffer.

Stage parameters are STACKED along a leading axis of size ``S`` and sharded
``P("pp", ...)`` so each device holds exactly its own stage's weights —
activations are the only thing that ever crosses the ICI link.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stages(per_stage_params):
    """Stack a list of S identically-structured stage pytrees into one pytree
    whose leaves have a leading stage axis (to be sharded over "pp")."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def _stage_spec(params):
    """P("pp", None, ...) spec for every leaf of a stacked-stage pytree."""
    return jax.tree.map(
        lambda x: P(*(("pp",) + (None,) * (x.ndim - 1))), params
    )


def pipeline_apply(
    stage_fn,
    stacked_params,
    x,
    *,
    mesh: Mesh,
    num_microbatches: int,
    extra_spec=P(),
    extra=(),
):
    """Run ``x`` through ``S`` pipeline stages of ``stage_fn`` over mesh axis
    "pp".

    - ``stage_fn(params_one_stage, activation, *extra) -> activation`` must
      preserve the activation's shape/dtype (a homogeneous transformer-layer
      stack satisfies this; embed/unembed live outside the pipeline).
    - ``stacked_params``: pytree with leading stage axis S on every leaf.
    - ``x``: [batch, ...] activations; batch must divide into
      ``num_microbatches`` equal microbatches.
    - ``extra``: broadcast side inputs (e.g. rope tables), replicated.

    Returns activations of the same shape as ``x``, replicated over "pp".

    Composition with data parallelism: when the mesh has a ``dp`` axis of
    size > 1, the microbatch dim is sharded ``P(None, "dp")`` so each dp
    replica pipelines its own slice of every microbatch — dp and pp compose
    multiplicatively (locked by tests/test_pipeline.py::test_pipeline_with_dp).
    """
    if "pp" not in mesh.axis_names:
        raise ValueError(
            f"pipeline_apply needs a 'pp' mesh axis; mesh has "
            f"{mesh.axis_names} (build one with parallel.mesh.make_mesh)")
    n_stages = mesh.shape["pp"]
    if x.shape[0] % num_microbatches:
        raise ValueError(
            f"batch {x.shape[0]} not divisible into {num_microbatches} "
            "microbatches")
    mb = x.shape[0] // num_microbatches
    dp = mesh.shape.get("dp", 1)
    if dp > 1 and mb % dp:
        raise ValueError(
            f"microbatch size {mb} not divisible by dp={dp}")
    # Shard the example dim of every microbatch over dp (replicate when the
    # mesh has no dp axis): each dp replica runs the pipeline on its own
    # examples — no redundant compute, standard dp speedup.
    x_spec = P(None, "dp") if dp > 1 else P()
    xs = x.reshape((num_microbatches, mb) + x.shape[1:])

    def run(params_local, xs, *extra):
        # params_local leading axis is this device's shard: size 1.
        p = jax.tree.map(lambda a: a[0], params_local)
        s = lax.axis_index("pp")
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def step(t, state):
            carry, buf = state
            # Stage 0 feeds microbatch t (clamped: garbage slots are masked
            # downstream); later stages consume the ppermuted carry.
            idx = jnp.clip(t, 0, num_microbatches - 1)
            inp0 = lax.dynamic_index_in_dim(xs, idx, keepdims=False)
            inp = jnp.where(s == 0, inp0, carry)
            out = stage_fn(p, inp, *extra)
            # Last stage banks microbatch t - (S-1) when that slot is real.
            mb_idx = t - (n_stages - 1)
            valid = jnp.logical_and(s == n_stages - 1, mb_idx >= 0)
            widx = jnp.clip(mb_idx, 0, num_microbatches - 1)
            cur = lax.dynamic_index_in_dim(buf, widx, keepdims=False)
            buf = lax.dynamic_update_index_in_dim(
                buf, jnp.where(valid, out, cur), widx, 0)
            carry = lax.ppermute(out, "pp", fwd)
            return carry, buf

        carry0 = jnp.zeros_like(xs[0])
        buf0 = jnp.zeros_like(xs)
        _, buf = lax.fori_loop(
            0, num_microbatches + n_stages - 1, step, (carry0, buf0))
        # Broadcast the last stage's buffer to every pp stage. Only the last
        # stage holds non-zero data, so this single exit psum IS what makes
        # out_specs' pp-replication contract true (see check_vma note below).
        # Cost: one allreduce of the output activations — O(batch·seq·dim)
        # once per pipeline invocation. Callers that only need the output on
        # one stage (e.g. an lm-head fused into the last stage_fn) should
        # fold that consumer into stage_fn rather than round-tripping.
        buf = lax.psum(
            jnp.where(s == n_stages - 1, buf, jnp.zeros_like(buf)), "pp")
        return buf

    # Non-"pp"/"dp" mesh axes are untouched: replicated.
    pspec = _stage_spec(stacked_params)
    in_specs = (pspec, x_spec) + ((extra_spec,) * len(extra))
    # check_vma=False: the loop carries pp-varying values (stage identity
    # enters via axis_index), which shard_map's varying-manual-axes checker
    # rejects wholesale. The out_specs P()-over-pp replication contract is
    # enforced manually by the exit psum above — any edit that removes or
    # reorders that psum breaks replication silently, so it is locked by
    # tests/test_pipeline.py::test_pipeline_matches_serial.
    out = jax.shard_map(
        run, mesh=mesh,
        in_specs=in_specs,
        out_specs=x_spec,
        check_vma=False,
    )(stacked_params, xs, *extra)
    return out.reshape(x.shape)


def shard_stacked(stacked_params, mesh: Mesh):
    """Place a stacked-stage pytree so each device holds one stage."""
    return jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(*(("pp",) + (None,) * (a.ndim - 1))))),
        stacked_params,
    )


def make_pipeline(stage_fn, *, mesh: Mesh, num_microbatches: int):
    """Partially-applied :func:`pipeline_apply` for jit-friendly reuse."""
    return functools.partial(
        pipeline_apply, stage_fn,
        mesh=mesh, num_microbatches=num_microbatches)
