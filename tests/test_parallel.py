"""Multi-device tests on the 8-device virtual CPU mesh: ring attention,
TP/DP Llama sharding — the multi-chip capability the reference never had
(SURVEY.md §2.4), validated the way it prescribes (virtual device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.ops.reference import attention_reference
from mfa_tpu.parallel import mesh as mesh_mod
from mfa_tpu.parallel import sharding
from mfa_tpu.parallel.ring_attention import make_ring_attention
from mfa_tpu.utils.testing import assert_close, make_attention_inputs


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    assert len(d) >= 8, "tests need the 8-device virtual CPU mesh"
    return d


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_full(rng, devices, causal):
    """Ring attention over sp=4 must equal single-device attention."""
    m = mesh_mod.make_mesh(dp=1, tp=2, sp=4)
    b, h, s, d = 1, 2, 256, 32
    q, k, v, _ = make_attention_inputs(rng, b, h, h, s, s, d)
    fn = make_ring_attention(m, causal=causal)
    o = fn(q, k, v)
    want, _ = attention_reference(q, k, v, causal=causal)
    assert_close(o, want, 5e-5, f"ring O causal={causal}")


def test_ring_attention_sp8(rng, devices):
    m = mesh_mod.make_mesh(dp=1, tp=1, sp=8)
    b, h, s, d = 1, 1, 512, 32
    q, k, v, _ = make_attention_inputs(rng, b, h, h, s, s, d)
    o = make_ring_attention(m, causal=True)(q, k, v)
    want, _ = attention_reference(q, k, v, causal=True)
    assert_close(o, want, 5e-5, "ring O sp=8")


def test_tp_llama_forward_matches(rng, devices):
    """TP=4 sharded Llama forward == replicated forward."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.key(0), cfg, jnp.float32)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    want = llama.forward(params, cfg, tokens)

    m = mesh_mod.make_mesh(dp=2, tp=4, sp=1)
    sparams = sharding.shard_params(params, m)
    tokens_sh = jax.device_put(
        tokens, jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec("dp")))

    fn = jax.jit(lambda p, t: llama.forward(p, cfg, t, interpret=True))
    got = fn(sparams, tokens_sh)
    assert_close(got, want, 1e-3, "TP forward logits")


def test_tp_llama_int8_forward(rng, devices):
    """Quantized params shard too."""
    from mfa_tpu.ops.precision import OperandPrecision

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.key(0), cfg, jnp.float32)
    qparams = llama.quantize_params(params, OperandPrecision.INT8)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    want = llama.forward(qparams, cfg, tokens)

    m = mesh_mod.make_mesh(dp=1, tp=4, sp=1)
    sq = sharding.shard_params(qparams, m)
    got = jax.jit(lambda p, t: llama.forward(p, cfg, t, interpret=True))(
        sq, tokens)
    assert_close(got, want, 1e-3, "TP int8 logits")


def test_mesh_validation():
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(dp=4, tp=4, sp=4)  # 64 > 8 devices


def test_ring_ppermute_overlap_structure(devices):
    """Round-2 VERDICT item 7: every ppermute in the ring's scan bodies must
    be carry-only (no same-iteration consumer) — the structural property
    that lets XLA's async collective-permute hide under the step's compute.
    Covers forward (K/V rotation) and backward (K/V + traveling dK/dV)."""
    import functools

    from jax.sharding import PartitionSpec as P

    from mfa_tpu.parallel.ring_attention import ring_flash_attention
    from mfa_tpu.utils.overlap import check_ppermute_overlap

    mesh = mesh_mod.make_mesh(dp=1, tp=1, sp=8)
    q = jnp.zeros((1, 2, 512, 64), jnp.float32)
    spec = P("dp", "tp", "sp", None)

    def fwd(q, k, v):
        return ring_flash_attention(q, k, v, causal=False, interpret=True)

    rep = check_ppermute_overlap(
        jax.shard_map(fwd, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                      check_vma=False), q, q, q)
    assert rep.ok, rep.violations
    assert rep.permutes_seen == 2          # K and V rotations

    def loss(q, k, v):
        o = ring_flash_attention(q, k, v, causal=False, interpret=True)
        return jnp.sum(o.astype(jnp.float32))

    rep_b = check_ppermute_overlap(
        jax.shard_map(jax.grad(loss, argnums=(0, 1, 2)), mesh=mesh,
                      in_specs=(spec,) * 3, out_specs=(spec,) * 3,
                      check_vma=False), q, q, q)
    assert rep_b.ok, rep_b.violations
    assert rep_b.permutes_seen == 6        # fwd K/V + bwd K/V/dK/dV
