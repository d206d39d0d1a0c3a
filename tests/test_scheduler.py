"""Continuous-batching scheduler: correctness of slot lifecycle and
parity of scheduled decode vs straight-line decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.serving.scheduler import ContinuousBatchingScheduler, Request


@pytest.fixture(scope="module")
def model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.key(1), cfg, jnp.float32)
    return cfg, params


def _reference_generate(params, cfg, prompt, n_new):
    """Straight-line greedy generation via full forward each step (oracle)."""
    toks = list(prompt)
    for _ in range(n_new):
        logits = llama.forward(
            params, cfg, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_single_request_matches_straightline(model):
    cfg, params = model
    prompt = [5, 17, 42, 7]
    want = _reference_generate(params, cfg, prompt, 6)

    sched = ContinuousBatchingScheduler(
        params, cfg, num_slots=2, max_len=64, prompt_buckets=(8, 16))
    sched.submit(Request(prompt=prompt, max_new_tokens=6))
    done = sched.run()
    assert len(done) == 1
    assert done[0].tokens == want


def test_continuous_admission(model):
    """More requests than slots: later requests admitted as slots free."""
    cfg, params = model
    rng = np.random.default_rng(0)
    reqs = [
        Request(prompt=list(rng.integers(1, cfg.vocab_size, ln)),
                max_new_tokens=nt)
        for ln, nt in [(3, 4), (5, 2), (2, 6), (4, 3), (6, 5)]
    ]
    sched = ContinuousBatchingScheduler(
        params, cfg, num_slots=2, max_len=64, prompt_buckets=(8, 16))
    for r in reqs:
        sched.submit(r)
    done = sched.run()
    assert len(done) == len(reqs)
    assert sched.stats["prefills"] == len(reqs)
    by_id = {c.request.id: c for c in done}
    for r in reqs:
        assert len(by_id[r.id].tokens) == r.max_new_tokens

    # Each completion must match straight-line generation (slot reuse and
    # batching must not leak state between requests).
    for r in reqs:
        want = _reference_generate(params, cfg, r.prompt, r.max_new_tokens)
        assert by_id[r.id].tokens == want, f"request {r.id} diverged"


def test_eos_stops_early(model):
    cfg, params = model
    prompt = [5, 17, 42, 7]
    ref = _reference_generate(params, cfg, prompt, 8)
    eos = ref[2]  # force an early stop at the 3rd generated token
    sched = ContinuousBatchingScheduler(
        params, cfg, num_slots=1, max_len=64, prompt_buckets=(8,))
    sched.submit(Request(prompt=prompt, max_new_tokens=8, eos_token=eos))
    done = sched.run()
    assert done[0].tokens == ref[:3]


def test_prompt_too_long_rejected(model):
    cfg, params = model
    sched = ContinuousBatchingScheduler(
        params, cfg, num_slots=1, max_len=32, prompt_buckets=(8, 16))
    sched.submit(Request(prompt=list(range(20)), max_new_tokens=2))
    with pytest.raises(ValueError, match="exceeds largest bucket"):
        sched.run()
