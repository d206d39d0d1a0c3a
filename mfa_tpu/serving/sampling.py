"""Token sampling: greedy, temperature, top-k — jit-friendly."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample(logits, key=None, *, temperature: float = 0.0, top_k: int = 0):
    """logits [B, vocab] → tokens [B] int32.

    temperature 0 → greedy. top_k > 0 restricts sampling to the k best.
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if key is None:
        raise ValueError("sampling with temperature needs a PRNG key")
    scaled = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
