"""Flax (linen) interop: drop-in attention module over the Pallas kernels.

For users whose models are flax modules: ``FlashSelfAttention`` replaces
``nn.SelfAttention``/dot-product attention with the mfa_tpu kernel stack
(same __call__ contract: [batch, seq, features] in/out), bringing the
fused kernels + two-kernel backward into existing flax training loops.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mfa_tpu.ops.attention import flash_attention


class FlashSelfAttention(nn.Module):
    """Multi-head (optionally grouped) self-attention via flash kernels.

    Attributes:
      num_heads: query heads.
      num_kv_heads: KV heads (GQA); defaults to num_heads.
      head_dim: per-head dim; defaults to features // num_heads.
      causal / sliding_window / logit_soft_cap: mask config.
      dtype: computation dtype for the projections (bf16 recommended).
    """

    num_heads: int
    num_kv_heads: int | None = None
    head_dim: int | None = None
    causal: bool = False
    sliding_window: int | None = None
    logit_soft_cap: float | None = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, t, f = x.shape
        hkv = self.num_kv_heads or self.num_heads
        hd = self.head_dim or f // self.num_heads

        dense = lambda feats, name: nn.DenseGeneral(
            features=feats, axis=-1, use_bias=False, dtype=self.dtype,
            name=name)
        q = dense((self.num_heads, hd), "q_proj")(x)
        k = dense((hkv, hd), "k_proj")(x)
        v = dense((hkv, hd), "v_proj")(x)

        o = flash_attention(
            jnp.moveaxis(q, 1, 2), jnp.moveaxis(k, 1, 2),
            jnp.moveaxis(v, 1, 2),
            causal=self.causal,
            sliding_window=self.sliding_window,
            logit_soft_cap=self.logit_soft_cap,
        )
        o = jnp.moveaxis(o, 1, 2).reshape(b, t, self.num_heads * hd)
        return nn.DenseGeneral(features=f, axis=-1, use_bias=False,
                               dtype=self.dtype, name="o_proj")(o)
