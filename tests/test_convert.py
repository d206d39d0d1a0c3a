"""Cross-validation against transformers: HF Llama (torch CPU) vs our
JAX/Pallas stack on identical random weights — the strongest independent
oracle in the suite."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from mfa_tpu.models import convert, llama  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return cfg, model


def test_logits_match_transformers(hf_model, rng):
    hf_cfg, model = hf_model
    cfg = convert.config_from_hf(hf_cfg)
    params = convert.params_from_hf(model.state_dict(), cfg, jnp.float32)

    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 24))
    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens)).logits.float().numpy()

    ours = np.asarray(llama.forward(
        params, cfg, jnp.asarray(tokens, jnp.int32)))

    # Two independent implementations (torch eager vs JAX/Pallas flash):
    # fp32 end-to-end should agree tightly.
    assert np.max(np.abs(ours - hf_logits)) < 2e-3, (
        f"max|Δlogits| = {np.max(np.abs(ours - hf_logits))}")
    # top-1 must agree everywhere
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).all()


def test_decode_matches_transformers_generation(hf_model, rng):
    """Greedy generation parity: HF generate vs our scheduler-free decode."""
    hf_cfg, model = hf_model
    cfg = convert.config_from_hf(hf_cfg)
    params = convert.params_from_hf(model.state_dict(), cfg, jnp.float32)

    prompt = rng.integers(0, hf_cfg.vocab_size, (1, 8))
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0)
    hf_new = hf_out[0, 8:].numpy().tolist()

    caches = llama.make_caches(cfg, 1, 64)
    logits, caches = llama.forward(
        params, cfg, jnp.asarray(prompt, jnp.int32), caches=caches)
    tok = int(np.argmax(np.asarray(logits)[0, -1]))
    ours_new = [tok]
    for _ in range(5):
        logits, caches = llama.decode_step(
            params, cfg, jnp.asarray([tok], jnp.int32), caches)
        tok = int(np.argmax(np.asarray(logits)[0]))
        ours_new.append(tok)
    assert ours_new == hf_new, (ours_new, hf_new)


@pytest.fixture(scope="module")
def hf_qwen2():
    cfg = transformers.Qwen2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attn_implementation="eager",
        # keep full attention (tiny seqs); Qwen2 SWA off
        use_sliding_window=False,
    )
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(cfg)
    model.eval()
    return cfg, model


def test_qwen2_logits_match_transformers(hf_qwen2, rng):
    """Qwen2 family (QKV attention bias): logits parity with transformers
    on identical random weights — the bias path's independent oracle."""
    hf_cfg, model = hf_qwen2
    cfg = convert.config_from_hf(hf_cfg)
    assert cfg.qkv_bias
    params = convert.params_from_hf(model.state_dict(), cfg, jnp.float32)
    assert "bq" in params["layers"][0]

    tokens = rng.integers(0, hf_cfg.vocab_size, (2, 24))
    with torch.no_grad():
        hf_logits = model(torch.tensor(tokens)).logits.float().numpy()
    ours = np.asarray(llama.forward(
        params, cfg, jnp.asarray(tokens, jnp.int32)))
    assert np.max(np.abs(ours - hf_logits)) < 2e-3
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).all()


def test_qwen2_decode_parity(hf_qwen2, rng):
    """Greedy decode through the fused-append KV-cache path matches HF
    generation for the bias'd family."""
    from mfa_tpu.ops.precision import OperandPrecision

    hf_cfg, model = hf_qwen2
    cfg = convert.config_from_hf(hf_cfg)
    params = convert.params_from_hf(model.state_dict(), cfg, jnp.float32)
    prompt = rng.integers(1, hf_cfg.vocab_size, (1, 6))
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(prompt), max_new_tokens=5, do_sample=False,
            pad_token_id=0)
    want = hf_out[0, prompt.shape[1]:].tolist()

    caches = llama.make_caches(cfg, 1, 64, OperandPrecision.FP32)
    logits, caches = llama.forward(
        params, cfg, jnp.asarray(prompt, jnp.int32), caches=caches)
    tok = int(np.argmax(np.asarray(logits[0, -1])))
    got = [tok]
    for _ in range(4):
        logits, caches = llama.decode_step(
            params, cfg, jnp.asarray([tok], jnp.int32), caches)
        tok = int(np.argmax(np.asarray(logits[0])))
        got.append(tok)
    assert got == want
