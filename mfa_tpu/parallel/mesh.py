"""Device-mesh construction and axis conventions.

The distributed layer the reference lacks entirely (SURVEY.md §2.4: "no
NCCL/MPI/Gloo/UCX; zero networking code") — on TPU this is jax.sharding
meshes with XLA collectives over ICI (intra-slice) and DCN (cross-host).

Axis conventions used throughout mfa_tpu:
  "dp" — data parallel (batch; maps to DCN across hosts)
  "pp" — pipeline parallel (layer stages; ICI, activations only)
  "tp" — tensor parallel (attention heads / FFN hidden; ICI)
  "sp" — sequence parallel (ring attention KV rotation; ICI)
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1, pp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, pp, tp, sp) mesh. Axis sizes must multiply to the device
    count used. ICI-heavy axes (tp, sp) are placed innermost so they map to
    adjacent devices; pp next (stage handoffs are one ppermute hop per
    microbatch — latency-tolerant); dp outermost so it can span DCN."""
    devices = list(devices if devices is not None else jax.devices())
    n = dp * tp * sp * pp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(dp, pp, tp, sp)
    return Mesh(arr, ("dp", "pp", "tp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, rank: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp", *([None] * (rank - 1))))
