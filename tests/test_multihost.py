"""Multi-host scaffolding on the single-host virtual mesh (VERDICT r1 §8).

Real 2-host runs can't happen in this environment; these tests lock the
bootstrap no-op path, the DCN-aware mesh fallback, and the tokens/s
scaling-efficiency measurement path end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.parallel import multihost


def test_initialize_noop_single_process():
    info = multihost.initialize_distributed()
    assert info["process_count"] == 1
    assert info["global_devices"] == len(jax.devices())


def test_hybrid_mesh_single_process_layout():
    mesh = multihost.make_hybrid_mesh(dp=2, tp=2, sp=2)
    assert mesh.axis_names == ("dp", "pp", "tp", "sp")
    assert mesh.shape["dp"] == 2 and mesh.shape["tp"] == 2
    # Same axis convention as parallel.mesh.make_mesh → sharding code is
    # interchangeable between the two constructors.
    from mfa_tpu.parallel import mesh as mesh_mod

    assert mesh.axis_names == mesh_mod.make_mesh(dp=2, tp=2, sp=2).axis_names


def test_hybrid_mesh_too_many_devices():
    import pytest

    with pytest.raises(ValueError, match="need"):
        multihost.make_hybrid_mesh(dp=1024)


def test_dp_scaling_efficiency_harness(rng):
    """The measurement path runs end to end on the virtual mesh and returns
    a positive efficiency (no perf claim on virtual CPU devices)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def make_step(mesh):
        dp = mesh.shape["dp"]
        w = jax.device_put(
            jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
            NamedSharding(mesh, P()))
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((dp * 4, 16, 64)), jnp.float32),
            NamedSharding(mesh, P("dp", None, None)))

        @jax.jit
        def step(w, x):
            return jnp.mean(jnp.tanh(x @ w) ** 2)

        return step, (w, x), x.shape[0] * x.shape[1]

    res = multihost.dp_scaling_efficiency(make_step, dp_sizes=(1, 4))
    assert res["dp"] == 4
    assert res["dp1_tok_s"] > 0 and res["dpN_tok_s"] > 0
    assert res["efficiency"] > 0
