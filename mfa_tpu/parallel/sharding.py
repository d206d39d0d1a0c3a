"""Model/param shardings: tensor-parallel Llama over an ICI mesh.

Megatron-style TP mapping onto `jax.sharding` (SURVEY.md §2.4 "TPU-native
equivalent to build" — head/KV-head sharding of QKV/O projections + KV
cache over ICI):

  wq/wk/wv   : column-parallel — output (head) axis over "tp"
  wo         : row-parallel    — input (head) axis over "tp"
  w_gate/w_up: column-parallel — ffn_hidden over "tp"
  w_down     : row-parallel    — ffn_hidden over "tp"
  embed      : replicated; lm_head column-parallel
  KV cache   : kv-head axis over "tp" (GQA: 8 KV heads → tp ≤ 8)

With params placed under these NamedShardings and the batch sharded over
"dp", plain ``jax.jit`` of models/llama.forward lets XLA's SPMD partitioner
insert the all-reduces after wo and w_down (the collectives ride ICI) —
the idiomatic pjit path rather than hand-written comms (of which the
reference has none anyway).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_specs(params) -> dict:
    """PartitionSpec pytree matching models/llama.init_params output."""
    col = P(None, "tp")     # [in, out-sharded]
    row = P("tp", None)     # [in-sharded, out]
    rep = P()

    def layer_spec(layer):
        spec = {
            "attn_norm": rep,
            "wq": col, "wk": col, "wv": col,
            "wo": row,
            "mlp_norm": rep,
            "w_gate": col, "w_up": col,
            "w_down": row,
        }
        # Quantized weights (QuantizedWeight pytree) have per-kind
        # storage layouts: int8 keeps w [in, out] with scale [1, out];
        # int4 is half-split packed [in/2, out] with scale [1, out].
        from mfa_tpu.kernels.quant import QuantizedWeight

        out = {}
        # Qwen2-style QKV biases: per-output-feature, column-parallel.
        for bias in ("bq", "bk", "bv"):
            if bias in layer:
                out[bias] = P("tp")
        for name, s in spec.items():
            w = layer[name]
            if isinstance(w, QuantizedWeight):
                is_col = name not in ("wo", "w_down")
                if w.kind == "int8":
                    w_spec = col if is_col else row
                    s_spec = P(None, "tp") if is_col else rep
                else:  # int4, half-split packed [in/2, out] layout
                    # Column-parallel: out axis shards cleanly. Row-parallel
                    # CANNOT shard the packed contraction dim (byte i holds
                    # logical rows i and i+K/2 — a contiguous packed-row
                    # shard is a non-contiguous logical shard that no local
                    # activation slice matches). INT4 row-parallel weights
                    # under TP need per-shard packing, which the global
                    # pack layout does not express — fail loudly rather
                    # than mis-shard (INT4 is the single-chip config-5
                    # path; use INT8 weights for TP serving).
                    if not is_col:
                        raise NotImplementedError(
                            "INT4 half-split weights cannot be row-"
                            "parallel-sharded (wo/w_down under tp); use "
                            "INT8 weights for tensor-parallel serving")
                    w_spec = P(None, "tp")
                    s_spec = P(None, "tp")
                out[name] = QuantizedWeight(w_spec, s_spec, w.kind)
            else:
                out[name] = s
        return out

    spec = {
        "embed": rep,
        "final_norm": rep,
        "layers": [layer_spec(l) for l in params["layers"]],
    }
    if "lm_head" in params:
        spec["lm_head"] = col
    return spec


def shard_params(params, mesh: Mesh):
    """device_put the param pytree under TP shardings."""
    from mfa_tpu.kernels.quant import QuantizedWeight

    specs = param_specs(params)

    def put(x, s):
        if s is None or not hasattr(x, "shape"):
            return x
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(
        put, params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list, QuantizedWeight)),
    )


def cache_specs(mesh: Mesh):
    """KV cache sharding: batch over dp, KV heads over tp."""
    data = NamedSharding(mesh, P("dp", "tp", None, None))
    vec = NamedSharding(mesh, P("dp"))
    return {"k": data, "v": data, "k_scale": data, "v_scale": data,
            "lengths": vec}


def shard_cache(cache, mesh: Mesh):
    specs = cache_specs(mesh)
    from dataclasses import replace

    return replace(
        cache,
        k=jax.device_put(cache.k, specs["k"]),
        v=jax.device_put(cache.v, specs["v"]),
        k_scale=jax.device_put(cache.k_scale, specs["k_scale"]),
        v_scale=jax.device_put(cache.v_scale, specs["v_scale"]),
        lengths=jax.device_put(cache.lengths, specs["lengths"]),
    )
