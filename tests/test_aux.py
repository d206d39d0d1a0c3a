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
    like = llama.init_params(jax.random.key(99), cfg, jnp.float32)
    restored, meta = checkpoint.load(tmp_path / "ckpt", like)
    assert meta["step"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_kv_cache_roundtrip(model, tmp_path):
    cfg, _ = model
    caches = llama.make_caches(cfg, 2, 32, OperandPrecision.INT8)
    checkpoint.save(tmp_path / "kv", caches)
    like = llama.make_caches(cfg, 2, 32, OperandPrecision.INT8)
    restored, _ = checkpoint.load(tmp_path / "kv", like)
    assert restored[0].precision == OperandPrecision.INT8
    assert restored[0].k.dtype == jnp.int8


def test_checkpoint_quantized_params_roundtrip(model, tmp_path):
    """Round-trip with QuantizedWeight leaves (round-3 VERDICT item 8):
    the path-keyed format reconstructs custom pytree nodes from the
    template, no pickled treedef."""
    cfg, params = model
    qparams = llama.quantize_params(params, OperandPrecision.INT8)
    checkpoint.save(tmp_path / "q", qparams, metadata={"kind": "int8"})
    like = llama.quantize_params(
        llama.init_params(jax.random.key(5), cfg, jnp.float32),
        OperandPrecision.INT8)
    restored, meta = checkpoint.load(tmp_path / "q", like)
    assert meta["kind"] == "int8"
    w0 = restored["layers"][0]["wq"]
    from mfa_tpu.kernels.quant import QuantizedWeight
    assert isinstance(w0, QuantizedWeight) and w0.kind == "int8"
    for a, b in zip(jax.tree_util.tree_leaves(qparams),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_sharded_cache_roundtrip(model, tmp_path):
    """Sharded save/restore on the virtual mesh: a (dp, tp)-sharded KV
    cache round-trips with its placement restored from the template."""
    from jax.sharding import Mesh
    from mfa_tpu.serving.distributed import shard_caches

    cfg, _ = model
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    caches = llama.make_caches(cfg, 2, 32, OperandPrecision.INT8)
    filled = []
    for c in caches:
        k = jnp.ones((2, cfg.n_kv_heads, 8, cfg.head_dim), jnp.float32)
        filled.append(__import__("mfa_tpu.serving.kv_cache",
                                 fromlist=["update"]).update(c, k, k))
    sharded = shard_caches(filled, mesh)
    checkpoint.save(tmp_path / "sc", sharded)
    like = shard_caches(llama.make_caches(cfg, 2, 32, OperandPrecision.INT8),
                        mesh)
    restored, _ = checkpoint.load(tmp_path / "sc", like)
    assert restored[0].k.sharding == sharded[0].k.sharding
    np.testing.assert_array_equal(np.asarray(restored[0].k),
                                  np.asarray(sharded[0].k))
    assert np.asarray(restored[0].lengths).tolist() == [8, 8]


def test_checkpoint_rejects_unknown_format(tmp_path):
    import json as _json
    d = tmp_path / "bad"
    d.mkdir()
    (d / "meta.json").write_text(_json.dumps({"format": "v1"}))
    with pytest.raises(ValueError):
        checkpoint.load(d, like={})


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


def test_ulysses_backward_matches_oracle(rng):
    """Differentiable Ulysses (VERDICT r1 item 9): grads through the two
    all-to-alls + the custom-VJP kernel match the single-device oracle."""
    import functools
    from jax.sharding import PartitionSpec as P
    from mfa_tpu.ops.reference import attention_grads_reference
    from mfa_tpu.parallel.ulysses import ulysses_attention

    m = mesh_mod.make_mesh(dp=1, tp=1, sp=4)
    b, h, s, d = 1, 8, 256, 32
    q, k, v, do = make_attention_inputs(rng, b, h, h, s, s, d)
    spec = P("dp", "tp", "sp", None)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=m,
        in_specs=(spec, spec, spec, spec), out_specs=(spec, spec, spec),
        check_vma=False,
    )
    def grads(q, k, v, do):
        def loss(q, k, v):
            o = ulysses_attention(q, k, v, causal=True)
            return jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    dq, dk, dv = grads(q, k, v, do)
    wq, wk, wv, _ = attention_grads_reference(q, k, v, do, causal=True)
    assert_close(dq, wq, 5e-5, "ulysses dQ")
    assert_close(dk, wk, 5e-5, "ulysses dK")
    assert_close(dv, wv, 5e-5, "ulysses dV")


def test_ulysses_gqa(rng):
    """GQA through Ulysses: q and kv head counts divide independently."""
    m = mesh_mod.make_mesh(dp=1, tp=1, sp=4)
    q, k, v, _ = make_attention_inputs(rng, 1, 8, 4, 128, 128, 32)
    o = make_ulysses_attention(m, causal=False)(q, k, v)
    want, _ = attention_reference(q, k, v)
    assert_close(o, want, 5e-5, "ulysses GQA O")


def test_cp_mode_crossover():
    """The documented ulysses-vs-ring rule (parallel/ulysses.py)."""
    from mfa_tpu.parallel.ulysses import choose_cp_mode

    # Heads divide, sequence fits → ulysses (cheaper on the wire by ~n/2).
    assert choose_cp_mode(32, 8, 32768, 128, 8) == "ulysses"
    # GQA with fewer KV heads than devices → ring (no KV replication).
    assert choose_cp_mode(32, 4, 32768, 128, 8) == "ring"
    # Extreme context: full sequence blows the HBM budget → ring.
    assert choose_cp_mode(32, 8, 64 * 1024 * 1024, 128, 8) == "ring"
