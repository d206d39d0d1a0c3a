"""Training utilities: loss, train step, optimizer wiring.

Rounds out the training side of the framework (the reference is
inference-kernels-only; our backward kernels exist to train). Pure
functional: state in, state out; jit/shard-transparent (params may carry
NamedShardings from parallel/sharding.py — XLA partitions the step).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from mfa_tpu.models import llama


@partial(jax.tree_util.register_dataclass,
         data_fields=["params", "opt_state", "step"], meta_fields=[])
@dataclass(frozen=True)
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def cross_entropy_loss(logits, targets, ignore_index: int = -100):
    """Mean token NLL over non-ignored positions. logits [B,T,V] fp32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.where(targets == ignore_index, 0, targets)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = (targets != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_optimizer(lr: float = 3e-4, weight_decay: float = 0.1,
                   warmup_steps: int = 100, total_steps: int = 10_000,
                   b1: float = 0.9, b2: float = 0.95,
                   grad_clip: float = 1.0):
    """AdamW + cosine schedule + global-norm clipping — the standard
    LLM-training recipe."""
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, total_steps, end_value=lr * 0.1)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay),
    )


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(params=params,
                      opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def train_step(state: TrainState, tokens, cfg: llama.LlamaConfig,
               optimizer, *, interpret=None):
    """One step of causal-LM training: tokens [B, T] → (state', metrics).

    Forward runs through the flash kernels; backward through the
    atomics-free two-kernel VJP.
    """

    def loss_fn(params):
        logits = llama.forward(params, cfg, tokens[:, :-1],
                               interpret=interpret)
        return cross_entropy_loss(logits, tokens[:, 1:])

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    gnorm = optax.global_norm(grads)
    new_state = TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1)
    return new_state, {"loss": loss, "grad_norm": gnorm}
