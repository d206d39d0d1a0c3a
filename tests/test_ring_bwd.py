"""Differentiable ring attention: gradients vs single-device oracle."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from mfa_tpu.ops.reference import attention_grads_reference
from mfa_tpu.parallel import mesh as mesh_mod
from mfa_tpu.parallel.ring_attention import ring_flash_attention
from mfa_tpu.utils.testing import assert_close, make_attention_inputs


def _ring_grads(mesh, q, k, v, do, causal):
    spec = P("dp", "tp", "sp", None)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec), out_specs=(spec, spec, spec),
        check_vma=False,
    )
    def grads(q, k, v, do):
        def loss(q, k, v):
            o = ring_flash_attention(q, k, v, causal=causal)
            # Local partial loss; grads of the global sum flow correctly
            # because psum of the loss has unit cotangent everywhere.
            return jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    return grads(q, k, v, do)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_grads_match_oracle(rng, causal):
    mesh = mesh_mod.make_mesh(dp=1, tp=2, sp=4)
    b, h, s, d = 1, 2, 256, 32
    q, k, v, do = make_attention_inputs(rng, b, h, h, s, s, d)
    dq, dk, dv = _ring_grads(mesh, q, k, v, do, causal)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do, causal=causal)
    assert_close(dq, wq, 5e-5, f"ring dQ causal={causal}")
    assert_close(dk, wk, 5e-5, f"ring dK causal={causal}")
    assert_close(dv, wv, 5e-5, f"ring dV causal={causal}")


def test_ring_grads_sp8(rng):
    mesh = mesh_mod.make_mesh(dp=1, tp=1, sp=8)
    b, h, s, d = 1, 1, 256, 16
    q, k, v, do = make_attention_inputs(rng, b, h, h, s, s, d)
    dq, dk, dv = _ring_grads(mesh, q, k, v, do, causal=True)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do, causal=True)
    assert_close(dq, wq, 5e-5, "ring dQ sp8")
    assert_close(dk, wk, 5e-5, "ring dK sp8")
    assert_close(dv, wv, 5e-5, "ring dV sp8")


def test_ring_grads_bf16_travel(rng):
    """BF16 inputs: dK/dV partial sums travel the ring in bf16 (half the
    backward comm volume — round-1 VERDICT item 6). Mixed budget 5e-2."""
    mesh = mesh_mod.make_mesh(dp=1, tp=1, sp=4)
    b, h, s, d = 1, 2, 256, 32
    q, k, v, do = make_attention_inputs(rng, b, h, h, s, s, d,
                                        dtype=jnp.bfloat16)
    dq, dk, dv = _ring_grads(mesh, q, k, v, do, causal=True)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do, causal=True)
    assert_close(dq, wq, 5e-2, "ring dQ bf16")
    assert_close(dk, wk, 5e-2, "ring dK bf16")
    assert_close(dv, wv, 5e-2, "ring dV bf16")
