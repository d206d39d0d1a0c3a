"""Hugging Face Llama/Mistral/Qwen2 checkpoint conversion.

Maps a ``transformers`` Llama-architecture state dict onto the mfa_tpu
param pytree (models/llama.py layout), so real released weights load
directly. Also the strongest correctness oracle the framework has: logits
vs an independent implementation (tests/test_convert.py).

Accepts either a ``transformers`` model instance / state_dict (torch CPU
tensors) or a dict of numpy arrays with HF key names.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mfa_tpu.models.llama import LlamaConfig


def config_from_hf(hf_config) -> LlamaConfig:
    """Build LlamaConfig from a transformers LlamaConfig/MistralConfig."""
    return LlamaConfig(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads",
                           hf_config.num_attention_heads),
        ffn_hidden=hf_config.intermediate_size,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        norm_eps=hf_config.rms_norm_eps,
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        sliding_window=getattr(hf_config, "sliding_window", None),
        # Llama exposes attention_bias; Qwen2 always uses QKV bias.
        qkv_bias=bool(getattr(hf_config, "attention_bias", False)
                      or getattr(hf_config, "model_type", "") == "qwen2"),
    )


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float().numpy()
    return np.asarray(t, dtype=np.float32)


def params_from_hf(state_dict, cfg: LlamaConfig, dtype=jnp.bfloat16):
    """Convert an HF Llama state dict (torch tensors or numpy) to the
    mfa_tpu param pytree. HF stores projections as [out, in]; ours are
    [in, out]. RoPE needs no weight permutation: models/llama.apply_rope
    uses the same rotate-half pairing (x[i] with x[i+d/2], inv_freq[i]) as
    transformers' LlamaRotaryEmbedding — only Meta-native checkpoints would
    need the interleave permutation, and those should be converted to HF
    format first."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}

    def lin(name):
        return jnp.asarray(sd[name].T, dtype)

    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], dtype),
        "final_norm": jnp.asarray(sd["model.norm.weight"], jnp.float32),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        params["layers"].append({
            "attn_norm": jnp.asarray(sd[p + "input_layernorm.weight"],
                                     jnp.float32),
            "wq": lin(p + "self_attn.q_proj.weight"),
            "wk": lin(p + "self_attn.k_proj.weight"),
            "wv": lin(p + "self_attn.v_proj.weight"),
            "wo": lin(p + "self_attn.o_proj.weight"),
            "mlp_norm": jnp.asarray(
                sd[p + "post_attention_layernorm.weight"], jnp.float32),
            "w_gate": lin(p + "mlp.gate_proj.weight"),
            "w_up": lin(p + "mlp.up_proj.weight"),
            "w_down": lin(p + "mlp.down_proj.weight"),
        })
        if cfg.qkv_bias:
            for ours, theirs in (("bq", "q_proj"), ("bk", "k_proj"),
                                 ("bv", "v_proj")):
                params["layers"][-1][ours] = jnp.asarray(
                    sd[p + f"self_attn.{theirs}.bias"], jnp.float32)
    if not cfg.tie_embeddings:
        if "lm_head.weight" in sd:
            params["lm_head"] = lin("lm_head.weight")
        else:
            params["lm_head"] = jnp.asarray(
                sd["model.embed_tokens.weight"].T, dtype)
    return params
