"""Multi-chip serving: sharded decode step + scheduler over the virtual
8-device CPU mesh (BASELINE.json config 5; VERDICT round-3 Missing #1).

Correctness bar: the mesh path must reproduce the single-chip scheduler's
greedy outputs exactly — the mesh is a layout, not a model change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mfa_tpu.models import llama
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving import kv_cache as kv_mod
from mfa_tpu.serving.distributed import (
    ShardedScheduler, make_decode_step, shard_caches)
from mfa_tpu.serving.scheduler import ContinuousBatchingScheduler, Request


def _mesh(dp, tp):
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


def _tiny():
    return llama.LlamaConfig.tiny()


def test_sharded_decode_step_matches_single_chip():
    cfg = _tiny()
    params = llama.init_params(jax.random.key(0), cfg, jnp.float32)
    batch, ctx = 4, 96
    rng = np.random.default_rng(0)

    def fill(caches):
        out = []
        for c in caches:
            k = jnp.asarray(rng.standard_normal(
                (batch, cfg.n_kv_heads, ctx, cfg.head_dim)) * 0.3,
                jnp.float32)
            out.append(kv_mod.update(c, k, k))
        return out

    rng = np.random.default_rng(0)
    caches_ref = fill(llama.make_caches(cfg, batch, 128,
                                        OperandPrecision.FP32))
    rng = np.random.default_rng(0)
    caches_mesh = fill(llama.make_caches(cfg, batch, 128,
                                         OperandPrecision.FP32))
    tokens = jnp.asarray([3, 5, 7, 11], jnp.int32)

    logits_ref, caches_ref = llama.decode_step(params, cfg, tokens,
                                               caches_ref)

    mesh = _mesh(2, 2)  # tiny cfg has 2 kv heads -> tp <= 2
    sharded = shard_caches(caches_mesh, mesh)
    step = make_decode_step(cfg, mesh, params, sharded, donate=False)
    from mfa_tpu.parallel.sharding import shard_params
    sp = shard_params(params, mesh)
    logits_mesh, caches_out = step(sp, tokens, sharded)

    np.testing.assert_allclose(np.asarray(logits_mesh),
                               np.asarray(logits_ref), atol=2e-4)
    # Cache contents advance identically (lengths + appended K row).
    np.testing.assert_array_equal(np.asarray(caches_out[0].lengths),
                                  np.asarray(caches_ref[0].lengths))
    np.testing.assert_allclose(
        np.asarray(caches_out[0].k[:, :, ctx]),
        np.asarray(caches_ref[0].k[:, :, ctx]), atol=2e-5)


def test_sharded_decode_step_rejects_bad_tp():
    cfg = _tiny()
    params = llama.init_params(jax.random.key(0), cfg, jnp.float32)
    caches = llama.make_caches(cfg, 4, 128, OperandPrecision.FP32)
    devs = np.array(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "tp"))  # tp=8 > 2 kv heads
    with pytest.raises(ValueError):
        make_decode_step(cfg, mesh, params, caches)


@pytest.mark.parametrize("kv_prec", [OperandPrecision.FP32,
                                     OperandPrecision.INT8])
def test_sharded_scheduler_matches_single_chip(kv_prec):
    """One admit -> decode -> retire continuous-batching cycle on the mesh
    reproduces the single-chip scheduler's greedy tokens exactly."""
    cfg = _tiny()
    params = llama.init_params(jax.random.key(1), cfg, jnp.float32)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [11, 12, 13, 14, 15, 16, 17]]

    def run(sched):
        for p in prompts:
            sched.submit(Request(prompt=p, max_new_tokens=6))
        done = sched.run(max_steps=64)
        return {c.request.id % 1000: c.tokens for c in done}

    common = dict(num_slots=2, max_len=128, kv_precision=kv_prec,
                  prompt_buckets=(8, 16), temperature=0.0)
    ref = ContinuousBatchingScheduler(params, cfg, **common)
    out_ref = run(ref)

    mesh = _mesh(2, 2)
    msched = ShardedScheduler(params, cfg, mesh=mesh, **common)
    out_mesh = run(msched)

    assert len(out_ref) == len(out_mesh) == len(prompts)
    ref_by_prompt = sorted(out_ref.values())
    mesh_by_prompt = sorted(out_mesh.values())
    assert ref_by_prompt == mesh_by_prompt
