"""Paged scheduler: parity with straight-line decode + page accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.models import llama
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving.paged_scheduler import PagedScheduler
from mfa_tpu.serving.scheduler import Request


@pytest.fixture(scope="module")
def model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.key(1), cfg, jnp.float32)
    return cfg, params


def _reference_generate(params, cfg, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits = llama.forward(params, cfg, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_paged_matches_straightline(model):
    cfg, params = model
    prompt = [5, 17, 42, 7]
    want = _reference_generate(params, cfg, prompt, 6)
    sched = PagedScheduler(params, cfg, num_slots=2, num_pages=16,
                           max_len=256, prompt_buckets=(8, 16))
    sched.submit(Request(prompt=prompt, max_new_tokens=6))
    done = sched.run()
    assert len(done) == 1
    assert done[0].tokens == want


def test_paged_continuous_and_page_recycling(model):
    cfg, params = model
    rng = np.random.default_rng(0)
    reqs = [Request(prompt=list(rng.integers(1, cfg.vocab_size, ln)),
                    max_new_tokens=nt)
            for ln, nt in [(3, 4), (6, 3), (2, 5), (4, 2)]]
    sched = PagedScheduler(params, cfg, num_slots=2, num_pages=8,
                           max_len=256, prompt_buckets=(8, 16))
    start_free = sched.free_pages
    for r in reqs:
        sched.submit(r)
    done = sched.run()
    assert len(done) == 4
    # all pages returned after all requests finish
    assert sched.free_pages == start_free
    by_id = {c.request.id: c for c in done}
    for r in reqs:
        want = _reference_generate(params, cfg, r.prompt, r.max_new_tokens)
        assert by_id[r.id].tokens == want, f"request {r.id} diverged"


def test_paged_int8_kv(model):
    cfg, params = model
    prompt = [5, 17, 42, 7]
    sched = PagedScheduler(params, cfg, num_slots=1, num_pages=16,
                           max_len=256, prompt_buckets=(8,),
                           kv_precision=OperandPrecision.INT8)
    sched.submit(Request(prompt=prompt, max_new_tokens=4))
    done = sched.run()
    # INT8 KV perturbs logits by the quantization budget, so greedy
    # near-ties may flip vs the full-precision path (the round-4 scale-fold
    # rework changed the rounding ORDER, not its magnitude, and flipped one
    # such tie on this random tiny model). The robust correctness bar: each
    # chosen token must be near-argmax under the FULL-PRECISION model along
    # the actually-generated history — a corrupted cache produces tokens
    # with large logit deficits, a quantization tie does not.
    toks = done[0].tokens
    assert len(toks) == 4
    hist = list(prompt)
    for tok in toks:
        logits = llama.forward(params, cfg, jnp.asarray([hist], jnp.int32))
        row = np.asarray(logits[0, -1])
        deficit = float(row.max() - row[tok])
        assert deficit < 0.05, (tok, deficit)
        hist.append(tok)


def test_admission_deferred_under_memory_pressure(model):
    cfg, params = model
    # 2 pages total (1 reserved) — only one request fits at a time.
    sched = PagedScheduler(params, cfg, num_slots=2, num_pages=2,
                           max_len=256, prompt_buckets=(8,))
    sched.submit(Request(prompt=[1, 2, 3], max_new_tokens=2))
    sched.submit(Request(prompt=[4, 5, 6], max_new_tokens=2))
    done = sched.run()
    assert len(done) == 2
    assert sched.stats["oom_deferred"] >= 1
