"""Training loop: loss decreases through the flash-kernel VJP; masking."""

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama, training


def test_loss_decreases(rng):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.key(0), cfg, jnp.float32)
    opt = training.make_optimizer(lr=1e-2, warmup_steps=1, total_steps=50)
    state = training.create_train_state(params, opt)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 24)), jnp.int32)

    step = jax.jit(
        lambda s, t: training.train_step(s, t, cfg, opt, interpret=True))
    losses = []
    for _ in range(8):
        state, metrics = step(state, tokens)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["grad_norm"]))
    # Memorizing a fixed batch: loss must drop substantially.
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 8


def test_ignore_index_masking():
    logits = jnp.zeros((1, 4, 10), jnp.float32)
    targets = jnp.asarray([[1, 2, -100, -100]], jnp.int32)
    loss = training.cross_entropy_loss(logits, targets)
    # uniform logits → loss = log(10) over the 2 live positions
    np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-5)


def test_all_ignored_is_finite():
    logits = jnp.zeros((1, 3, 10), jnp.float32)
    targets = jnp.full((1, 3), -100, jnp.int32)
    assert np.isfinite(float(training.cross_entropy_loss(logits, targets)))
