"""Aux subsystems: checkpoint/resume, perplexity harness, Ulysses CP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.ops.reference import attention_reference
from mfa_tpu.parallel import mesh as mesh_mod
from mfa_tpu.parallel.ulysses import make_ulysses_attention
from mfa_tpu.utils import checkpoint, evaluate
from mfa_tpu.utils.testing import assert_close, make_attention_inputs


@pytest.fixture(scope="module")
def model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.key(2), cfg, jnp.float32)
    return cfg, params


def test_checkpoint_roundtrip(model, tmp_path):
    cfg, params = model
    checkpoint.save(tmp_path / "ckpt", params, metadata={"step": 7})
    restored, meta = checkpoint.load(tmp_path / "ckpt")
    assert meta["step"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_kv_cache_roundtrip(model, tmp_path):
    cfg, _ = model
    caches = llama.make_caches(cfg, 2, 32, OperandPrecision.INT8)
    checkpoint.save(tmp_path / "kv", caches)
    restored, _ = checkpoint.load(tmp_path / "kv")
    assert restored[0].precision == OperandPrecision.INT8
    assert restored[0].k.dtype == jnp.int8


def test_perplexity_parity_and_kv_delta(model, rng):
    """Decode-path perplexity ≈ full-forward perplexity; int8 KV delta
    within the north-star budget (<= 0.05 absolute at tiny scale)."""
    cfg, params = model
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 20)), jnp.int32)

    p_full = evaluate.perplexity_full(params, cfg, tokens)
    p_ref, p_q, delta = evaluate.kv_quantization_ppl_delta(
        params, cfg, tokens, OperandPrecision.INT8)
    # Decode path scores positions 2..T-1; compare orders of magnitude.
    assert 0.5 * p_full < p_ref < 2.0 * p_full
    assert delta / p_ref < 0.02, f"int8 KV ppl delta {delta} vs {p_ref}"


def test_ulysses_matches_full(rng):
    m = mesh_mod.make_mesh(dp=1, tp=1, sp=4)
    b, h, s, d = 1, 8, 256, 32
    q, k, v, _ = make_attention_inputs(rng, b, h, h, s, s, d)
    for causal in (False, True):
        o = make_ulysses_attention(m, causal=causal)(q, k, v)
        want, _ = attention_reference(q, k, v, causal=causal)
        assert_close(o, want, 5e-5, f"ulysses O causal={causal}")


def test_ulysses_rejects_bad_heads(rng):
    m = mesh_mod.make_mesh(dp=1, tp=1, sp=4)
    q, k, v, _ = make_attention_inputs(rng, 1, 2, 2, 64, 64, 16)
    with pytest.raises(Exception):
        jax.block_until_ready(make_ulysses_attention(m)(q, k, v))
