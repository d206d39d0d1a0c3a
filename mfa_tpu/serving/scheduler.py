"""Continuous-batching scheduler: slot-based serving over bucketed shapes.

The serving layer the reference has no analogue of (it is a kernel library)
but the north star requires ("continuous batching across hosts",
BASELINE.json). Design constraints, from SURVEY.md §7 hard part 5:

- XLA must not recompile per batch composition → all jitted steps run at a
  FIXED batch of slots; prompts prefill at bucketed (power-of-two padded)
  lengths. Buckets are the moral equivalent of the reference's Metal
  function constants (static problem dims baked per pipeline,
  GEMMKernel+Source.swift:117-127).
- Requests join/leave the batch between steps ("continuous"): a finished
  slot is refilled by the next queued request without disturbing others;
  per-slot KV state lives at its slot index in the shared cache.

The scheduler itself is host-side Python (the reference's dispatch loop is
host Swift, SquareAttentionTest.swift:319-339); the compute steps —
prefill-into-slot and batched decode — are jitted functions.
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from mfa_tpu.models import llama
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving import kv_cache as kv_mod
from mfa_tpu.serving.sampling import sample


@dataclasses.dataclass
class Request:
    prompt: list            # token ids
    max_new_tokens: int = 32
    eos_token: int | None = None
    id: int = dataclasses.field(default_factory=itertools.count().__next__)


@dataclasses.dataclass
class Completion:
    request: Request
    tokens: list
    prefill_len: int


def make_splice():
    """Jitted slot-splice: write a batch-1 prefilled cache into ``slot``
    of every layer's multi-slot cache in ONE dispatch (dynamic slot index —
    one compile serves every slot; per-layer eager ``write_slot`` calls
    cost a tunnel RTT each at 32 layers). Works unchanged on sharded
    caches: XLA SPMD partitions the dynamic-update-slices over the
    existing shardings (serving/distributed.py uses the same build)."""
    import dataclasses as _dc

    def splice_one(c, c1, slot, true_len):
        def dus(buf, new):
            start = (slot,) + (0,) * (buf.ndim - 1)
            return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                                start)
        return _dc.replace(
            c,
            k=dus(c.k, c1.k), v=dus(c.v, c1.v),
            k_scale=dus(c.k_scale, c1.k_scale),
            v_scale=dus(c.v_scale, c1.v_scale),
            lengths=jax.lax.dynamic_update_slice(
                c.lengths, true_len[None].astype(c.lengths.dtype), (slot,)),
        )

    def fn(caches, caches1, slot, true_len):
        return [splice_one(c, c1, slot, true_len)
                for c, c1 in zip(caches, caches1)]

    return jax.jit(fn, donate_argnums=(0,))


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class ContinuousBatchingScheduler:
    """Slot-based continuous batching for one model replica.

    Usage:
        sched = ContinuousBatchingScheduler(params, cfg, num_slots=8,
                                            max_len=2048)
        sched.submit(Request(prompt=[...], max_new_tokens=64))
        done = sched.run()          # or step() repeatedly
    """

    def __init__(
        self,
        params,
        cfg: llama.LlamaConfig,
        *,
        num_slots: int = 8,
        max_len: int = 2048,
        kv_precision: OperandPrecision = OperandPrecision.BF16,
        prompt_buckets=(64, 128, 256, 512, 1024, 2048),
        temperature: float = 0.0,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        self.max_len = max_len
        self.prompt_buckets = tuple(
            b for b in prompt_buckets if b <= max_len)
        self.temperature = temperature
        self._key = jax.random.key(seed)

        self.caches = llama.make_caches(cfg, num_slots, max_len, kv_precision)
        self.queue: list[Request] = []
        self.slots: list[dict | None] = [None] * num_slots
        self.last_tokens = np.zeros((num_slots,), np.int32)
        self.finished: list[Completion] = []
        self.stats = {"prefills": 0, "decode_steps": 0, "tokens": 0}

        self._prefill_fns: dict = {}
        self._decode_fn = None   # built lazily on first decode step
        self._splice_fn = None

    # -- jitted steps -----------------------------------------------------

    def _prefill_fn(self, bucket: int):
        """Jitted: run the prompt through forward with a batch-1 cache and
        return (last logits, layer K/V slabs) to splice into a slot."""
        if bucket in self._prefill_fns:
            return self._prefill_fns[bucket]
        cfg = self.cfg
        precision = self.caches[0].precision
        max_len = self.max_len

        @jax.jit
        def fn(params, tokens, true_len):
            caches1 = llama.make_caches(cfg, 1, max_len, precision)
            # Zero positions beyond true_len keep rope/cache writes finite;
            # attention over padded tail is causal-masked away for the
            # tokens we read logits from.
            logits, caches1 = llama.forward(
                params, cfg, tokens[None, :], caches=caches1)
            last = logits[0, true_len - 1]
            return last, caches1

        self._prefill_fns[bucket] = fn
        return fn

    def _decode(self, params, tokens, key):
        """One jitted decode+sample dispatch: sampling runs ON DEVICE
        inside the same executable, so the host round-trip per step is one
        dispatch + a [num_slots]-int readback (several eager sampling ops
        per step cost a tunnel RTT each — round-4 serving bench)."""
        if self._decode_fn is None:
            cfg = self.cfg
            temperature = self.temperature

            @jax.jit
            def fn(params, tokens, caches, key):
                logits, caches = llama.decode_step(params, cfg, tokens,
                                                   caches)
                toks = sample(logits, key, temperature=temperature)
                return toks, caches

            self._decode_fn = fn
        return self._decode_fn(params, tokens, self.caches, key)

    # -- host-side orchestration -----------------------------------------

    def submit(self, request: Request):
        self.queue.append(request)

    def _free_slots(self):
        return [i for i, s in enumerate(self.slots) if s is None]

    def _admit(self):
        """Prefill queued requests into free slots (continuous admission)."""
        for slot in self._free_slots():
            if not self.queue:
                break
            req = self.queue.pop(0)
            t = len(req.prompt)
            bucket = _bucket(t, self.prompt_buckets)
            tokens = np.zeros((bucket,), np.int32)
            tokens[:t] = req.prompt
            last_logits, caches1 = self._prefill_fn(bucket)(
                self.params, jnp.asarray(tokens), t)
            # Splice the single-sequence cache into the slot, trimming the
            # appended length to the true prompt length (overridden by the
            # mesh scheduler, serving/distributed.py).
            self._splice(slot, caches1, t)
            tok = int(sample(last_logits[None, :],
                             self._next_key(),
                             temperature=self.temperature)[0])
            self.slots[slot] = {
                "request": req, "generated": [tok], "prefill_len": t,
            }
            self.last_tokens[slot] = tok
            self.stats["prefills"] += 1
            self.stats["tokens"] += 1

    def _splice(self, slot, caches1, true_len):
        if self._splice_fn is None:
            self._splice_fn = make_splice()
        self.caches = self._splice_fn(
            self.caches, caches1, jnp.asarray(slot, jnp.int32),
            jnp.asarray(true_len, jnp.int32))

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _retire(self):
        for i, s in enumerate(self.slots):
            if s is None:
                continue
            req = s["request"]
            gen = s["generated"]
            done = len(gen) >= req.max_new_tokens or (
                req.eos_token is not None and gen and gen[-1] == req.eos_token)
            overflow = s["prefill_len"] + len(gen) >= self.max_len
            if done or overflow:
                self.finished.append(
                    Completion(req, list(gen), s["prefill_len"]))
                self.slots[i] = None
                self.caches = [
                    kv_mod.reset_slot(c, i) for c in self.caches]

    def step(self):
        """One scheduler tick: retire, admit, one batched decode step."""
        self._retire()
        self._admit()
        if not any(s is not None for s in self.slots):
            return False
        toks_dev, self.caches = self._decode(
            self.params, jnp.asarray(self.last_tokens), self._next_key())
        toks = np.asarray(toks_dev)
        for i, s in enumerate(self.slots):
            if s is None:
                continue
            s["generated"].append(int(toks[i]))
            self.last_tokens[i] = int(toks[i])
            self.stats["tokens"] += 1
        self.stats["decode_steps"] += 1
        return True

    def run(self, max_steps: int = 10_000):
        for _ in range(max_steps):
            if not self.step() and not self.queue:
                break
        self._retire()
        return self.finished
