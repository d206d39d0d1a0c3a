"""Numerical-sanity guards: the reference's NaN canary, institutionalized.

The reference plants NaN canaries in output buffers and checks NaN/Inf
agreement (SquareAttentionTest.swift:286,521-524) — test-time only. A
production training/serving loop needs the same checks at runtime:
:func:`check_finite` for pytrees (grads, params, logits), cheap enough to
run every N steps, raising with the offending leaf path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class NonFiniteError(RuntimeError):
    pass


def nonfinite_leaves(tree) -> list:
    """Paths of leaves containing NaN/Inf (device-synced; use sparingly)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    return bad


def check_finite(tree, what: str = "tree"):
    bad = nonfinite_leaves(tree)
    if bad:
        raise NonFiniteError(
            f"non-finite values in {what}: {', '.join(bad[:10])}"
            + (f" (+{len(bad)-10} more)" if len(bad) > 10 else ""))


def finite_or_skip(grads, params):
    """Jit-friendly guard: returns (ok, grads') where grads' are zeroed
    when any leaf is non-finite — the 'skip bad step' recipe for training
    loops (no host sync; pairs with an optimizer update)."""
    leaves = [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(
        grads) if hasattr(g, "dtype")]
    ok = jnp.stack(leaves).all() if leaves else jnp.bool_(True)
    zeroed = jax.tree_util.tree_map(
        lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
    return ok, zeroed
