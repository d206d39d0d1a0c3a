"""Multi-host bootstrap + DCN-aware meshes + scaling-efficiency harness.

The reference has zero networking code (SURVEY.md §2.4); the TPU-native
story is: one JAX process per host, `jax.distributed.initialize` to form
the cluster, then a hybrid mesh whose outermost axis maps onto DCN
(cross-host data parallelism) and whose inner axes (pp/tp/sp) stay on ICI.
North-star target (BASELINE.json): >=80% tokens/s scaling efficiency on a
2-host v5e slice.

The harness itself is exercised on the single-host virtual CPU mesh by the
driver's dryrun (see ``__graft_entry__.dryrun_multichip``), so the
measurement path is tested even where real multi-host runs can't happen.

Launch (per host)::

    python -m mfa_tpu.parallel.multihost --coordinator HOST0:8476 \
        --num-processes 2 --process-id $RANK  # then exec your trainer

or from code: ``initialize_distributed()`` (env-var driven on Cloud TPU,
where coordinator/process-id autodetect from the metadata service).
"""

from __future__ import annotations

import time

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# XLA flags that let collective-permute run asynchronously under compute on
# real TPU slices — what makes the ring layer's rotate-before-compute
# structure (parallel/ring_attention.py) actually overlap. Append to
# LIBTPU_INIT_ARGS / XLA_FLAGS in the launch environment; they are defaults
# on recent libtpu but pinned here so the launch recipe is explicit.
ICI_OVERLAP_XLA_FLAGS = (
    "--xla_tpu_enable_async_collective_permute=true "
    "--xla_tpu_overlap_compute_collective_tc=true "
    "--xla_enable_async_all_gather=true"
)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Form (or report) the multi-host JAX cluster.

    Safe to call unconditionally: a single-process run (or one already
    initialized) is a no-op. On Cloud TPU all three arguments autodetect;
    elsewhere pass them (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, which jax.distributed reads).

    Returns a summary dict {process_index, process_count, local_devices,
    global_devices} for logging.
    """
    want_init = (
        coordinator_address is not None
        or num_processes is not None
        or _env_requests_distributed()
    )
    if want_init and jax.process_count() == 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError:
            pass  # already initialized by the launcher
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def _env_requests_distributed() -> bool:
    import os

    return any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )


def make_hybrid_mesh(
    dp: int = 1, pp: int = 1, tp: int = 1, sp: int = 1,
    devices=None,
) -> Mesh:
    """DCN-aware (dp, pp, tp, sp) mesh.

    With multiple processes, the dp axis is laid out so consecutive dp
    indices differ by HOST first (via mesh_utils.create_hybrid_device_mesh):
    dp gradients all-reduce over DCN where bandwidth is lowest but the
    collective is latency-tolerant, while pp/tp/sp stay inside one host's
    ICI domain. Single-process (incl. the virtual CPU mesh) falls back to
    the plain device order — same axis names, so all sharding code is
    identical in tests and production.
    """
    if devices is None:
        devices = jax.devices()
    n = dp * pp * tp * sp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")

    if jax.process_count() > 1 and dp % jax.process_count() == 0:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp // jax.process_count(), pp, tp, sp),
            dcn_mesh_shape=(jax.process_count(), 1, 1, 1),
            devices=devices[:n],
        )
    else:
        dev_array = np.array(devices[:n]).reshape(dp, pp, tp, sp)
    return Mesh(dev_array, ("dp", "pp", "tp", "sp"))


# ---------------------------------------------------------------------------
# Scaling-efficiency harness
# ---------------------------------------------------------------------------


def measure_tokens_per_s(step_fn, args, tokens_per_step: int,
                         warmup: int = 1, iters: int = 3) -> float:
    """Wall-clock tokens/s of one jitted train/serve step."""
    for _ in range(warmup):
        out = step_fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return tokens_per_step / max(dt, 1e-9)


def dp_scaling_efficiency(
    make_step,
    *,
    dp_sizes=(1, None),
    mesh_kwargs=None,
) -> dict:
    """Measure tokens/s at dp=1 vs dp=N and report the scaling ratio.

    ``make_step(mesh) -> (step_fn, args, tokens_per_step)`` builds the
    jitted step for one mesh; the global batch scales with dp (weak
    scaling), so perfect efficiency = N× tokens/s = ratio 1.0.

    ``dp_sizes``: (baseline, target); ``None`` target = all devices.
    Returns {"dp1_tok_s", "dpN_tok_s", "dp", "efficiency"}.
    """
    mesh_kwargs = dict(mesh_kwargs or {})
    base_dp, big_dp = dp_sizes
    if big_dp is None:
        inner = 1
        for v in mesh_kwargs.values():
            inner *= v
        big_dp = max(1, len(jax.devices()) // inner)

    results = {}
    for tag, dp in (("dp1", base_dp), ("dpN", big_dp)):
        mesh = make_hybrid_mesh(dp=dp, **mesh_kwargs)
        step_fn, args, tokens_per_step = make_step(mesh)
        results[f"{tag}_tok_s"] = measure_tokens_per_s(
            step_fn, args, tokens_per_step)
    results["dp"] = big_dp
    # Weak scaling: dpN runs dp× the tokens; efficiency = speedup / dp.
    results["efficiency"] = (
        results["dpN_tok_s"] / results["dp1_tok_s"] / (big_dp / base_dp)
    )
    return results


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser(description="multi-host bootstrap probe")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()
    info = initialize_distributed(
        args.coordinator, args.num_processes, args.process_id)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
