"""Pipeline parallelism: GPipe microbatch schedule over the "pp" mesh axis
must match serial stage application exactly (fp32), including composition
with data parallelism. CPU rung on 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.parallel import mesh as mesh_mod
from mfa_tpu.parallel.pipeline import (
    make_pipeline, pipeline_apply, shard_stacked, stack_stages)


def _stage_fn(p, x):
    # A residual MLP block: shape-preserving, nonlinear, uses real matmuls.
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def _make_stages(rng, n_stages, dim, hidden):
    stages = []
    for _ in range(n_stages):
        stages.append({
            "w1": jnp.asarray(rng.standard_normal((dim, hidden)) * 0.1,
                              jnp.float32),
            "b1": jnp.asarray(rng.standard_normal((hidden,)) * 0.1,
                              jnp.float32),
            "w2": jnp.asarray(rng.standard_normal((hidden, dim)) * 0.1,
                              jnp.float32),
        })
    return stages


def _serial(stages, x):
    for p in stages:
        x = _stage_fn(p, x)
    return x


@pytest.mark.parametrize("num_micro", [4, 8, 6])
def test_pipeline_matches_serial(rng, num_micro):
    n_stages, dim, hidden = 4, 64, 128
    mesh = mesh_mod.make_mesh(pp=n_stages)
    stages = _make_stages(rng, n_stages, dim, hidden)
    stacked = shard_stacked(stack_stages(stages), mesh)
    x = jnp.asarray(rng.standard_normal((num_micro * 3, 16, dim)),
                    jnp.float32)

    out = jax.jit(
        make_pipeline(_stage_fn, mesh=mesh, num_microbatches=num_micro)
    )(stacked, x)
    expected = _serial(stages, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-5)


def test_pipeline_with_dp(rng):
    """pp=4 × dp=2: pipeline output stays correct when other mesh axes
    exist (activations replicated over them inside the pipeline)."""
    n_stages, dim, hidden = 4, 32, 64
    mesh = mesh_mod.make_mesh(dp=2, pp=n_stages)
    stages = _make_stages(rng, n_stages, dim, hidden)
    stacked = shard_stacked(stack_stages(stages), mesh)
    x = jnp.asarray(rng.standard_normal((8, 4, dim)), jnp.float32)

    out = jax.jit(lambda p, x: pipeline_apply(
        _stage_fn, p, x, mesh=mesh, num_microbatches=4))(stacked, x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_serial(stages, x)), atol=1e-5)


def test_pipeline_requires_pp_axis(rng):
    """A mesh without a 'pp' axis (hand-built, not via make_mesh) raises a
    named error, not a bare KeyError."""
    import numpy as onp
    from jax.sharding import Mesh
    mesh = Mesh(onp.array(jax.devices()[:2]), ("x",))
    stages = _make_stages(rng, 2, 16, 32)
    x = jnp.zeros((4, 2, 16), jnp.float32)
    with pytest.raises(ValueError, match="pp"):
        pipeline_apply(_stage_fn, stack_stages(stages), x,
                       mesh=mesh, num_microbatches=2)


def test_pipeline_dp_sharding_is_real(rng):
    """With a dp axis, the pipeline's shard_map consumes dp-sharded
    microbatches (P(None, 'dp')) rather than replicating work — each dp
    replica sees mb/dp examples (ADVICE round-1 medium finding)."""
    n_stages = 2
    mesh = mesh_mod.make_mesh(dp=2, pp=n_stages)
    stages = _make_stages(rng, n_stages, 16, 32)
    stacked = shard_stacked(stack_stages(stages), mesh)
    x = jnp.asarray(rng.standard_normal((8, 4, 16)), jnp.float32)

    seen = []

    def probe_stage(p, a):
        seen.append(a.shape)
        return _stage_fn(p, a)

    pipeline_apply(probe_stage, stacked, x, mesh=mesh, num_microbatches=4)
    # microbatch = 8/4 = 2 examples; dp=2 → each replica traces 1 example.
    assert seen and seen[0][0] == 1


def test_pipeline_grad(rng):
    """The schedule is differentiable (fori_loop + ppermute have transposes
    via the scan/psum rules): grads match the serial stack's grads."""
    n_stages, dim, hidden = 2, 16, 32
    mesh = mesh_mod.make_mesh(pp=n_stages)
    stages = _make_stages(rng, n_stages, dim, hidden)
    stacked = stack_stages(stages)
    x = jnp.asarray(rng.standard_normal((4, 2, dim)), jnp.float32)

    def loss_pp(p):
        return jnp.sum(pipeline_apply(
            _stage_fn, p, x, mesh=mesh, num_microbatches=2) ** 2)

    def loss_serial(p):
        return jnp.sum(_serial([jax.tree.map(lambda a: a[i], p)
                                for i in range(n_stages)], x) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_serial = jax.grad(loss_serial)(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_pp, g_serial)


def test_llama_forward_pipelined(rng):
    """Pipelined Llama forward (pp=2, 4 microbatches) matches the serial
    forward's logits."""
    from mfa_tpu.models import llama

    cfg = llama.LlamaConfig(vocab_size=256, dim=128, n_layers=4, n_heads=4,
                            n_kv_heads=2, ffn_hidden=256, rope_theta=1e4)
    params = llama.init_params(jax.random.key(0), cfg, jnp.float32)
    mesh = mesh_mod.make_mesh(pp=2)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 16)), jnp.int32)

    got = llama.forward_pipelined(params, cfg, tokens, mesh=mesh,
                                  num_microbatches=4)
    want = llama.forward(params, cfg, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
