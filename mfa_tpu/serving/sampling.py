"""Token sampling: greedy, temperature, top-k, top-p — jit-friendly."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample(logits, key=None, *, temperature: float = 0.0, top_k: int = 0,
           top_p: float = 1.0):
    """logits [B, vocab] → tokens [B] int32.

    temperature 0 → greedy. top_k > 0 restricts sampling to the k best;
    top_p < 1 restricts to the smallest nucleus whose probability mass
    reaches p (applied after top_k, vLLM order).
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if key is None:
        raise ValueError("sampling with temperature needs a PRNG key")
    scaled = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)
    if top_p < 1.0:
        # Keep the smallest descending-probability prefix with mass >= p
        # (always keeping the top token).
        srt = jnp.sort(scaled, axis=-1)[:, ::-1]              # descending
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Token ranks whose PRECEDING mass is already >= p are cut.
        keep = (cum - probs) < top_p                          # [B, vocab]
        cutoff = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                         keepdims=True)
        scaled = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
