"""Data loader, sanity guards, flax interop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.utils.data import TokenDataset
from mfa_tpu.utils.sanity import (
    NonFiniteError,
    check_finite,
    finite_or_skip,
    nonfinite_leaves,
)


def test_token_dataset_shapes_and_shuffle():
    tokens = np.arange(1000)
    ds = TokenDataset(tokens, seq_len=16, batch_size=4, seed=1)
    batches0 = list(ds.epoch(0))
    batches1 = list(ds.epoch(1))
    assert len(batches0) == len(ds)
    assert batches0[0].shape == (4, 17)
    # distinct epochs shuffle differently
    assert not np.array_equal(batches0[0], batches1[0])
    # same epoch reproducible
    assert np.array_equal(batches0[0], next(iter(ds.epoch(0))))
    # samples are contiguous windows
    row = batches0[0][0]
    assert np.array_equal(row, np.arange(row[0], row[0] + 17))


def test_token_dataset_too_short():
    with pytest.raises(ValueError, match="too short"):
        TokenDataset(np.arange(10), seq_len=16, batch_size=4)


def test_check_finite():
    good = {"a": jnp.ones((3,)), "b": [jnp.zeros((2, 2))]}
    check_finite(good)
    bad = {"a": jnp.ones((3,)), "b": [jnp.asarray([1.0, jnp.nan])]}
    assert nonfinite_leaves(bad) == ["['b'][0]"]
    with pytest.raises(NonFiniteError, match="b"):
        check_finite(bad, "grads")


def test_finite_or_skip():
    grads = {"w": jnp.asarray([1.0, 2.0])}
    ok, g = finite_or_skip(grads, None)
    assert bool(ok) and float(g["w"][0]) == 1.0
    grads = {"w": jnp.asarray([1.0, jnp.inf])}
    ok, g = finite_or_skip(grads, None)
    assert not bool(ok) and float(jnp.sum(jnp.abs(g["w"]))) == 0.0


def test_flax_interop(rng):
    from mfa_tpu.models.flax_interop import FlashSelfAttention
    from mfa_tpu.ops.reference import attention_reference

    mod = FlashSelfAttention(num_heads=4, num_kv_heads=2, causal=True,
                             dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 64)), jnp.float32)
    params = mod.init(jax.random.key(0), x)
    y = mod.apply(params, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))

    # Parity against the oracle using the module's own projections.
    p = params["params"]
    q = jnp.einsum("btf,fhd->bhtd", x, p["q_proj"]["kernel"])
    k = jnp.einsum("btf,fhd->bhtd", x, p["k_proj"]["kernel"])
    v = jnp.einsum("btf,fhd->bhtd", x, p["v_proj"]["kernel"])
    o_ref, _ = attention_reference(q, k, v, causal=True)
    o_ref = jnp.moveaxis(o_ref, 1, 2).reshape(2, 32, -1)
    want = jnp.einsum("bto,of->btf", o_ref,
                      p["o_proj"]["kernel"].reshape(-1, 64))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=2e-4)


def test_top_p_sampling_nucleus():
    """top-p keeps exactly the smallest descending-probability prefix with
    mass >= p (always at least the argmax); tokens outside the nucleus are
    never drawn."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mfa_tpu.serving.sampling import sample

    # probs ~ [0.6, 0.25, 0.1, 0.05] after softmax; p=0.7 → keep {0, 1}.
    base = np.log(np.array([[0.6, 0.25, 0.1, 0.05]], np.float32))
    logits = jnp.asarray(base)
    draws = set()
    for i in range(64):
        t = int(sample(logits, jax.random.key(i), temperature=1.0,
                       top_p=0.7)[0])
        draws.add(t)
    assert draws <= {0, 1}, draws
    assert 0 in draws

    # p=1.0 leaves the distribution untouched (all tokens reachable).
    draws = set()
    for i in range(256):
        t = int(sample(logits, jax.random.key(i), temperature=1.0,
                       top_p=1.0)[0])
        draws.add(t)
    assert draws == {0, 1, 2, 3}

    # Degenerate: top token mass alone exceeds p → greedy-like nucleus.
    t = int(sample(logits, jax.random.key(0), temperature=1.0,
                   top_p=0.1)[0])
    assert t == 0
