"""Llama-family model: functional JAX implementation over the kernel stack.

The model layer the reference does not have (it stops at kernels,
SURVEY.md §1: "no scheduler, communication, model, or CLI layer") but the
north star requires (Llama-3-8B decode, BASELINE.json).

Design:
- Pure-functional: params are a nested dict pytree; every step is jittable.
- Prefill/training attention = the flash kernels (ops/attention.py, causal);
  decode attention = the fused-dequant KV-cache kernel (ops/decode.py).
- Projections support weight-only INT8/INT4 (per-output-channel scales,
  dequant fused by XLA into the matmul epilogue) — BASELINE.json config 5.
- Rotary embeddings in fp32 for phase accuracy, applied pre-attention.
- All matmuls bf16 with fp32 accumulation (MXU-native), RMSNorm in fp32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from mfa_tpu.kernels import quant
from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.ops.decode import decode_attention_append
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving import kv_cache as kv_cache_mod


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    ffn_hidden: int = 14336
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    tie_embeddings: bool = False
    sliding_window: int | None = None   # Mistral-style SWA (all layers)
    qkv_bias: bool = False              # Qwen2-style attention bias

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @classmethod
    def llama3_8b(cls) -> "LlamaConfig":
        return cls()

    @classmethod
    def llama3_1b_proxy(cls) -> "LlamaConfig":
        """~1B-scale config for single-chip experiments."""
        return cls(dim=2048, n_layers=16, n_heads=32, n_kv_heads=8,
                   ffn_hidden=8192)

    @classmethod
    def mistral_7b(cls) -> "LlamaConfig":
        return cls(vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
                   n_kv_heads=8, ffn_hidden=14336, rope_theta=10000.0,
                   sliding_window=4096)

    @classmethod
    def qwen2_7b(cls) -> "LlamaConfig":
        return cls(vocab_size=152064, dim=3584, n_layers=28, n_heads=28,
                   n_kv_heads=4, ffn_hidden=18944, rope_theta=1000000.0,
                   norm_eps=1e-6, qkv_bias=True)

    @classmethod
    def tiny(cls) -> "LlamaConfig":
        """CPU-test scale."""
        return cls(vocab_size=256, dim=128, n_layers=2, n_heads=4,
                   n_kv_heads=2, ffn_hidden=256, rope_theta=10000.0)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(key, cfg: LlamaConfig, dtype=jnp.bfloat16):
    """Random-init parameter pytree (shape-compatible with Llama-3 weights)."""
    keys = iter(jax.random.split(key, cfg.n_layers * 7 + 3))

    def dense(k, d_in, d_out):
        w = jax.random.normal(k, (d_in, d_out), jnp.float32)
        return (w / math.sqrt(d_in)).astype(dtype)

    params = {
        "embed": jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.dim), jnp.float32
        ).astype(dtype) * 0.02,
        "final_norm": jnp.ones((cfg.dim,), jnp.float32),
        "layers": [],
    }
    hd = cfg.head_dim
    for _ in range(cfg.n_layers):
        layer = {
            "attn_norm": jnp.ones((cfg.dim,), jnp.float32),
            "wq": dense(next(keys), cfg.dim, cfg.n_heads * hd),
            "wk": dense(next(keys), cfg.dim, cfg.n_kv_heads * hd),
            "wv": dense(next(keys), cfg.dim, cfg.n_kv_heads * hd),
            "wo": dense(next(keys), cfg.n_heads * hd, cfg.dim),
            "mlp_norm": jnp.ones((cfg.dim,), jnp.float32),
            "w_gate": dense(next(keys), cfg.dim, cfg.ffn_hidden),
            "w_up": dense(next(keys), cfg.dim, cfg.ffn_hidden),
            "w_down": dense(next(keys), cfg.ffn_hidden, cfg.dim),
        }
        if cfg.qkv_bias:
            layer["bq"] = jnp.zeros((cfg.n_heads * hd,), jnp.float32)
            layer["bk"] = jnp.zeros((cfg.n_kv_heads * hd,), jnp.float32)
            layer["bv"] = jnp.zeros((cfg.n_kv_heads * hd,), jnp.float32)
        params["layers"].append(layer)
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(next(keys), cfg.dim, cfg.vocab_size)
    return params


_QUANTIZABLE = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def init_params_quantized(key, cfg: LlamaConfig,
                          precision: OperandPrecision,
                          dtype=jnp.bfloat16):
    """Memory-lean init for big models: each projection is created AND
    weight-only-quantized inside one jitted computation, so its
    full-precision form is only ever a transient inside XLA — peak HBM ≈
    final quantized bytes + one projection. The plain
    ``quantize_params(init_params(...))`` sequence peaks at ~2× the bf16
    model (16 GB+ for 8B), which OOMs a single v5e chip (round-3
    bench_decode post-mortem). Produces the same pytree as that sequence
    up to ±1 quantization step on jit-fused rounding ties (the transient is
    rounded through ``dtype`` exactly like ``init_params`` stores it;
    locked by tests/test_llama.py).
    """
    if precision not in (OperandPrecision.INT8, OperandPrecision.INT4):
        raise ValueError(f"unsupported weight precision {precision}")
    int8 = precision is OperandPrecision.INT8
    all_keys = jax.random.split(key, cfg.n_layers * 7 + 3)
    ki = 0
    kind = "int8" if int8 else "int4"
    hd = cfg.head_dim

    def qdense(k, d_in, d_out):
        w = jax.random.normal(k, (d_in, d_out), jnp.float32)
        w = (w / math.sqrt(d_in)).astype(dtype)      # same rounding as init
        wf = w.astype(jnp.float32)
        if int8:
            vals, scale = quant.quantize_int8(wf.T, axis=-1)
            return vals.T, scale.T
        # Half-split packing: streams at 4-bit rate through the fused
        # Pallas dequant matmul (kernels/quant_matmul.py). SIGNED nibbles:
        # the round-5 A/B measured the biased-unsigned unpack (one fewer
        # int VPU op/byte) at parity-to-1-3%-slower across the 8B decode
        # projections — the unpack op count is not the limiter
        # (docs/sweeps/int4_unpack.jsonl).
        return quant.pack_int4_halves(wf)

    # One compiled function covers every layer (identical shapes): a single
    # compile + n_layers dispatches instead of 7·n_layers per-tensor
    # dispatches, which dominated the 8B setup time over the remote tunnel
    # (~26 min round-3; per-layer it is a few minutes).
    @jax.jit
    def qlayer(keys7):
        shapes = ((cfg.dim, cfg.n_heads * hd), (cfg.dim, cfg.n_kv_heads * hd),
                  (cfg.dim, cfg.n_kv_heads * hd), (cfg.n_heads * hd, cfg.dim),
                  (cfg.dim, cfg.ffn_hidden), (cfg.dim, cfg.ffn_hidden),
                  (cfg.ffn_hidden, cfg.dim))
        return tuple(qdense(keys7[t], di, do)
                     for t, (di, do) in enumerate(shapes))

    def dense(k, d_in, d_out):
        w = jax.random.normal(k, (d_in, d_out), jnp.float32)
        return (w / math.sqrt(d_in)).astype(dtype)

    params = {
        "embed": jax.random.normal(
            all_keys[ki], (cfg.vocab_size, cfg.dim), jnp.float32
        ).astype(dtype) * 0.02,
        "final_norm": jnp.ones((cfg.dim,), jnp.float32),
        "layers": [],
    }
    ki += 1
    names = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
    for _ in range(cfg.n_layers):
        qw = qlayer(all_keys[ki:ki + 7])
        ki += 7
        layer = {"attn_norm": jnp.ones((cfg.dim,), jnp.float32),
                 "mlp_norm": jnp.ones((cfg.dim,), jnp.float32)}
        for t, name in enumerate(names):
            layer[name] = quant.QuantizedWeight(qw[t][0], qw[t][1], kind)
        if cfg.qkv_bias:
            layer["bq"] = jnp.zeros((cfg.n_heads * hd,), jnp.float32)
            layer["bk"] = jnp.zeros((cfg.n_kv_heads * hd,), jnp.float32)
            layer["bv"] = jnp.zeros((cfg.n_kv_heads * hd,), jnp.float32)
        params["layers"].append(layer)
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(all_keys[ki], cfg.dim, cfg.vocab_size)
    return params


def quantize_params(params, precision: OperandPrecision):
    """Weight-only quantization of every projection (INT8 or INT4),
    per-output-channel scales over the input axis. Embedding/lm_head stay
    high precision (accuracy-critical, small share of 8B weight bytes)."""
    if precision not in (OperandPrecision.INT8, OperandPrecision.INT4):
        raise ValueError(f"unsupported weight precision {precision}")

    def q(w):
        wf = w.astype(jnp.float32)
        if precision is OperandPrecision.INT8:
            vals, scale = quant.quantize_int8(wf.T, axis=-1)
            # store transposed back: vals [out, in] → [in, out]
            return quant.QuantizedWeight(vals.T, scale.T, "int8")
        # INT4: half-split packed [in/2, out] + scale [1, out] — the layout
        # the fused Pallas dequant matmul consumes at 4-bit HBM rate
        # (kernels/quant_matmul.py; the nibble-interleaved [out, in/2]
        # layout forced a full-weight dequant through HBM — 34 tok/s at 8B,
        # round-4 post-mortem). Signed nibbles: the biased-unsigned variant
        # measured at parity-to-slightly-slower (round-5 A/B); a uint8
        # packed array still dispatches to it transparently.
        vals, scale = quant.pack_int4_halves(wf)
        return quant.QuantizedWeight(vals, scale, "int4")  # [in/2, out]

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        nl = dict(layer)
        for name in _QUANTIZABLE:
            nl[name] = q(layer[name])
        out["layers"].append(nl)
    return out


def _matmul(x, w, dtype):
    """x @ w with transparent weight-only dequant.

    Quantized forms store per-output-channel scales; XLA fuses the scale
    multiply into the matmul epilogue, so the dequantized weight never hits
    HBM (the weight-only analogue of the KV dequant fusion)."""
    if isinstance(w, quant.QuantizedWeight):
        if w.kind == "int8":
            y = jnp.dot(x, w.w.astype(dtype),
                        preferred_element_type=jnp.float32)
            return (y * w.scale.astype(jnp.float32)).astype(dtype)
        if w.kind == "int4":
            from mfa_tpu.kernels.quant_matmul import int4_matmul

            return int4_matmul(x, w.w, w.scale).astype(dtype)
        raise ValueError(w.kind)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(dtype)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x, weight, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def rope_frequencies(cfg: LlamaConfig):
    hd = cfg.head_dim
    return 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))


def apply_rope(x, positions, inv_freq):
    """x: [B, H, T, D]; positions: [B, T] (absolute). fp32 phases."""
    angles = positions[:, None, :, None].astype(jnp.float32) * inv_freq  # B,1,T,D/2
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def _project_qkv(layer, x, cfg, dtype):
    b, t, _ = x.shape
    hd = cfg.head_dim

    def proj(wname, bname):
        y = _matmul(x, layer[wname], dtype)
        if bname in layer:                  # Qwen2-style attention bias
            y = (y.astype(jnp.float32)
                 + layer[bname].astype(jnp.float32)).astype(dtype)
        return y.reshape(b, t, -1, hd)

    # Head counts come from the projection widths, not cfg: inside a
    # tensor-parallel shard_map the layer holds the LOCAL head shard
    # (n_heads / tp), and the reshape must follow the local width.
    q = proj("wq", "bq")
    k = proj("wk", "bk")
    v = proj("wv", "bv")
    # [B, H, T, D]
    return (jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2))


def _mlp(layer, x, dtype):
    gate = _matmul(x, layer["w_gate"], dtype)
    up = _matmul(x, layer["w_up"], dtype)
    return _matmul(jax.nn.silu(gate.astype(jnp.float32)).astype(dtype) * up,
                   layer["w_down"], dtype)


# ---------------------------------------------------------------------------
# Forward (training / prefill) and decode
# ---------------------------------------------------------------------------


def _layer_apply(layer, x, positions, inv_freq, cfg: LlamaConfig, dtype,
                 interpret=None, return_kv=False, tp_axis=None):
    """One transformer block (attn + MLP, pre-norm residual), shape-
    preserving — the unit shared by the serial forward and the pipeline
    stage function. ``return_kv`` also yields the roped K and raw V (for
    prefill cache appends).

    ``tp_axis``: when running inside shard_map over a tensor-parallel mesh
    axis (parallel/sharding.py's Megatron mapping — wq/wk/wv column-
    parallel, wo/w_down row-parallel), name that axis here and the two
    row-parallel partial sums are all-reduced over it; activations stay
    replicated across tp (the collectives ride ICI, SURVEY.md §2.4)."""
    b, t, _ = x.shape
    h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
    q, k, v = _project_qkv(layer, h, cfg, dtype)
    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)
    o = flash_attention(q, k, v, causal=True,
                        sliding_window=cfg.sliding_window,
                        interpret=interpret)
    o = jnp.swapaxes(o, 1, 2).reshape(b, t, -1)
    att = _matmul(o, layer["wo"], dtype)
    if tp_axis is not None:
        att = jax.lax.psum(att, tp_axis)
    x = x + att
    h = rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
    mlp = _mlp(layer, h, dtype)
    if tp_axis is not None:
        mlp = jax.lax.psum(mlp, tp_axis)
    x = x + mlp
    if return_kv:
        return x, (k, v)
    return x


def _lm_head(params, cfg: LlamaConfig, x, dtype, tp_axis=None):
    """Final norm + logits. With ``tp_axis``, lm_head is column-parallel
    (parallel/sharding.py) and the vocab shards all-gather over tp."""
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    head = params.get("lm_head")
    if head is None:
        # Tied embeddings are replicated — full logits, no gather.
        return jnp.dot(x, params["embed"].T,
                       preferred_element_type=jnp.float32)
    logits = _matmul(x, head, dtype).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits


def forward(params, cfg: LlamaConfig, tokens, *, positions=None,
            caches=None, interpret=None, tp_axis=None):
    """Full forward over [B, T] tokens → logits [B, T, vocab].

    With ``caches`` (list of KVCache per layer): prefill mode — each
    layer's K/V are appended to its cache and attention still runs causal
    over the full prefix; returns (logits, new_caches).

    ``tp_axis``: tensor-parallel axis name when called inside shard_map
    over a mesh (see _layer_apply; serving/distributed.py drives this).
    """
    dtype = params["embed"].dtype
    b, t = tokens.shape
    if positions is None:
        if caches is not None:
            positions = caches[0].lengths[:, None] + jnp.arange(t)[None, :]
        else:
            positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    inv_freq = rope_frequencies(cfg)

    x = params["embed"][tokens]
    new_caches = [] if caches is not None else None
    for li, layer in enumerate(params["layers"]):
        if caches is not None:
            x, (k, v) = _layer_apply(layer, x, positions, inv_freq, cfg,
                                     dtype, interpret=interpret,
                                     return_kv=True, tp_axis=tp_axis)
            new_caches.append(kv_cache_mod.update(caches[li], k, v))
        else:
            x = _layer_apply(layer, x, positions, inv_freq, cfg, dtype,
                             interpret=interpret, tp_axis=tp_axis)

    logits = _lm_head(params, cfg, x, dtype, tp_axis)
    if new_caches is not None:
        return logits, new_caches
    return logits


def decode_step(params, cfg: LlamaConfig, tokens, caches, *, interpret=None,
                tp_axis=None):
    """One decode step: tokens [B] (the latest token per sequence) →
    (logits [B, vocab], updated caches). Uses the fused-dequant decode
    kernel against each layer's KV cache.

    ``tp_axis``: tensor-parallel axis name when running inside shard_map —
    projections/caches hold the local head shard and the row-parallel
    matmuls all-reduce over the axis (serving/distributed.py)."""
    dtype = params["embed"].dtype
    b = tokens.shape[0]
    positions = caches[0].lengths[:, None]                  # [B, 1]
    inv_freq = rope_frequencies(cfg)

    x = params["embed"][tokens][:, None, :]                 # [B, 1, dim]
    new_caches = []
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q, k, v = _project_qkv(layer, h, cfg, dtype)        # [B, H, 1, D]
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
        # Fused append+attend: the cache write rides the attention kernel
        # (aliased in/out cache, one-row DMA) instead of a separate
        # 4-scatter update pass — see ops/decode.decode_attention_append.
        o, cache = decode_attention_append(
            q[:, :, 0, :], k[:, :, 0, :], v[:, :, 0, :], caches[li],
            sliding_window=cfg.sliding_window, interpret=interpret)
        new_caches.append(cache)
        att = _matmul(o.reshape(b, 1, -1), layer["wo"], dtype)
        if tp_axis is not None:
            att = jax.lax.psum(att, tp_axis)
        x = x + att
        h = rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        mlp = _mlp(layer, h, dtype)
        if tp_axis is not None:
            mlp = jax.lax.psum(mlp, tp_axis)
        x = x + mlp

    logits = _lm_head(params, cfg, x[:, 0], dtype, tp_axis)
    return logits, new_caches


def stack_layer_params(params, n_stages: int):
    """Split the layer list into ``n_stages`` equal stages and stack each
    stage's layers along a leading axis, then stack stages: every leaf gains
    leading dims [n_stages, layers_per_stage] for ``P("pp", ...)`` sharding
    (parallel/pipeline.py). Quantized weights are pytrees and stack too."""
    layers = params["layers"]
    if len(layers) % n_stages:
        raise ValueError(
            f"{len(layers)} layers not divisible into {n_stages} stages")
    per = len(layers) // n_stages
    stages = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *layers[s * per:(s + 1) * per])
        for s in range(n_stages)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def forward_pipelined(params, cfg: LlamaConfig, tokens, *, mesh,
                      num_microbatches: int, stacked_layers=None,
                      interpret=None):
    """Forward with the transformer stack pipelined over the mesh's "pp"
    axis (GPipe microbatches over the batch dim; parallel/pipeline.py).

    Embedding and the LM head run outside the pipeline (replicated — they
    are a small share of 8B FLOPs). ``stacked_layers`` may be passed
    pre-sharded via :func:`parallel.pipeline.shard_stacked` to avoid
    re-stacking per step.
    """
    from mfa_tpu.parallel.pipeline import pipeline_apply

    dtype = params["embed"].dtype
    b, t = tokens.shape
    n_stages = mesh.shape["pp"]
    if stacked_layers is None:
        stacked_layers = stack_layer_params(params, n_stages)
    positions = jnp.arange(t)[None, :]          # broadcast over microbatch
    inv_freq = rope_frequencies(cfg)

    def stage_fn(stage_params, x, positions, inv_freq):
        # stage_params leaves: [layers_per_stage, ...] — scan the block.
        def body(x, layer):
            return _layer_apply(layer, x, positions, inv_freq, cfg, dtype,
                                interpret=interpret), None
        x, _ = jax.lax.scan(body, x, stage_params)
        return x

    x = params["embed"][tokens]
    x = pipeline_apply(
        stage_fn, stacked_layers, x,
        mesh=mesh, num_microbatches=num_microbatches,
        extra=(positions, inv_freq),
    )
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    head = params.get("lm_head")
    if head is None:
        return jnp.dot(x, params["embed"].T,
                       preferred_element_type=jnp.float32)
    return _matmul(x, head, dtype).astype(jnp.float32)


def make_caches(cfg: LlamaConfig, batch: int, max_len: int,
                precision: OperandPrecision = OperandPrecision.BF16):
    return [
        kv_cache_mod.create(batch, cfg.n_kv_heads, max_len, cfg.head_dim,
                            precision)
        for _ in range(cfg.n_layers)
    ]
