"""Multi-chip serving: the continuous-batching scheduler composed with a
(dp, tp) device mesh.

The subsystem BASELINE.json config 5 names ("Llama-3-8B decode, continuous
batching on 2-host v5e") and the reference cannot have (single-device,
README.md:7): one jitted decode step runs under shard_map over the mesh —
params in the Megatron TP mapping (parallel/sharding.py), the KV caches
sharded batch-over-dp / kv-heads-over-tp, the decode-attention Pallas
kernel operating on each device's local (B/dp, Hkv/tp) shard, and the two
row-parallel all-reduces + lm_head all-gather riding ICI (SURVEY.md §2.4
TP row).

GQA bound: tp must divide n_kv_heads (8 for Llama-3-8B → tp ≤ 8), so each
device keeps whole GQA groups and the kernel's group axis is unchanged.

The host-side scheduler logic (admission, retirement, buckets) is inherited
unchanged from serving/scheduler.py — only the three jitted steps (prefill,
splice, decode) are swapped for mesh-aware builds.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfa_tpu.models import llama
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.parallel.sharding import param_specs, shard_params
from mfa_tpu.serving import kv_cache as kv_mod
from mfa_tpu.serving.scheduler import ContinuousBatchingScheduler


def cache_spec(cache: kv_mod.KVCache, batch_axis="dp", head_axis="tp"):
    """PartitionSpec pytree for one layer's KVCache: batch over dp, KV
    heads over tp (the KV-cache-over-ICI row of SURVEY §2.4)."""
    data = P(batch_axis, head_axis, None, None)
    return kv_mod.KVCache(
        k=data, v=data, k_scale=data, v_scale=data,
        lengths=P(batch_axis), precision=cache.precision,
    )


def replicated_cache_spec(cache: kv_mod.KVCache, head_axis="tp"):
    """Batch-1 prefill cache: replicated over dp, heads sharded over tp."""
    data = P(None, head_axis, None, None)
    return kv_mod.KVCache(
        k=data, v=data, k_scale=data, v_scale=data,
        lengths=P(), precision=cache.precision,
    )


def shard_caches(caches, mesh: Mesh):
    """device_put each layer's cache under the (dp, tp) sharding."""
    out = []
    for c in caches:
        spec = cache_spec(c)
        out.append(replace(
            c,
            k=jax.device_put(c.k, NamedSharding(mesh, spec.k)),
            v=jax.device_put(c.v, NamedSharding(mesh, spec.v)),
            k_scale=jax.device_put(c.k_scale,
                                   NamedSharding(mesh, spec.k_scale)),
            v_scale=jax.device_put(c.v_scale,
                                   NamedSharding(mesh, spec.v_scale)),
            lengths=jax.device_put(c.lengths,
                                   NamedSharding(mesh, spec.lengths)),
        ))
    return out


def make_decode_step(cfg: llama.LlamaConfig, mesh: Mesh, params, caches,
                     donate: bool = True):
    """Build the jitted multi-chip decode step.

    fn(params, tokens, caches) -> (logits [B, vocab] replicated, caches).
    Inside shard_map every device sees its (B/dp, Hkv/tp) shard; the
    Pallas decode kernel runs on local shapes and the TP all-reduces are
    inserted explicitly (llama.decode_step tp_axis).
    """
    if cfg.n_kv_heads % mesh.shape["tp"] != 0:
        raise ValueError(
            f"tp={mesh.shape['tp']} must divide n_kv_heads={cfg.n_kv_heads}")
    pspecs = param_specs(params)
    cspecs = [cache_spec(c) for c in caches]

    def inner(params, tokens, caches):
        return llama.decode_step(params, cfg, tokens, caches,
                                 tp_axis="tp")

    mapped = shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P("dp"), cspecs),
        out_specs=(P("dp", None), cspecs),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(2,) if donate else ())


def make_prefill(cfg: llama.LlamaConfig, mesh: Mesh, params,
                 precision: OperandPrecision, max_len: int):
    """Build the jitted batch-1 prefill: replicated over dp (every dp group
    computes the same prompt — admission cost, not steady-state), heads
    over tp. Returns fn(params, tokens [bucket], true_len) ->
    (last_logits [vocab], caches1 list)."""
    pspecs = param_specs(params)
    tp = mesh.shape["tp"]
    hkv_local = cfg.n_kv_heads // tp

    def inner(params, tokens, true_len):
        caches1 = [
            kv_mod.create(1, hkv_local, max_len, cfg.head_dim, precision)
            for _ in range(cfg.n_layers)
        ]
        logits, caches1 = llama.forward(
            params, cfg, tokens[None, :], caches=caches1, tp_axis="tp")
        return logits[0, true_len - 1], caches1

    # Dummy layer cache to build the replicated out spec.
    probe = kv_mod.create(1, max(hkv_local, 1), 8, cfg.head_dim, precision)
    cspec1 = [replicated_cache_spec(probe) for _ in range(cfg.n_layers)]
    mapped = shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P(), P()),
        out_specs=(P(), cspec1),
        check_vma=False,
    )
    return jax.jit(mapped)




class ShardedScheduler(ContinuousBatchingScheduler):
    """Continuous batching over a (dp, tp) mesh.

    Same host-side behavior as the single-chip scheduler (identical
    admission/retire/bucket logic — locked by tests/test_distributed.py
    matching its greedy outputs); params, caches, and the three jitted
    steps live on the mesh. ``num_slots`` must divide by mesh dp.
    """

    def __init__(self, params, cfg, *, mesh: Mesh, **kw):
        self.mesh = mesh
        if kw.get("num_slots", 8) % mesh.shape["dp"] != 0:
            raise ValueError("num_slots must be a multiple of mesh dp")
        super().__init__(params, cfg, **kw)
        self.params = shard_params(params, mesh)
        self.caches = shard_caches(self.caches, mesh)

    def _prefill_fn(self, bucket: int):
        if bucket in self._prefill_fns:
            return self._prefill_fns[bucket]
        fn = make_prefill(self.cfg, self.mesh, self.params,
                          self.caches[0].precision, self.max_len)

        def wrapped(params, tokens, true_len):
            return fn(params, tokens, jnp.asarray(true_len, jnp.int32))

        self._prefill_fns[bucket] = wrapped
        return wrapped

    def _decode(self, params, tokens, key):
        if self._decode_fn is None:
            step = make_decode_step(self.cfg, self.mesh, params,
                                    self.caches, donate=False)
            temperature = self.temperature

            @jax.jit
            def fn(params, tokens, caches, key):
                logits, caches = step(params, tokens, caches)
                from mfa_tpu.serving.sampling import sample
                return sample(logits, key, temperature=temperature), caches

            self._decode_fn = fn
        return self._decode_fn(params, tokens, self.caches, key)
