#!/usr/bin/env python
"""Real-chip smoke drive: the verify recipe, formalized.

Runs the library surface on the REAL TPU (axon tunnel) against the
oracles — flash fwd + both backward kernels (causal GQA bf16), decode
attention over fp8/int8/bf16 caches, and a tiny Llama forward+decode —
asserting every measured error budget (docs/MEASUREMENTS.md). ~3 min incl.
compiles; prints DRIVE PASS on success.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/smoke_chip.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from mfa_tpu.ops.attention import flash_attention
from mfa_tpu.ops.decode import decode_attention
from mfa_tpu.ops.reference import attention_reference, attention_grads_reference
from mfa_tpu.ops.precision import OperandPrecision
from mfa_tpu.serving import kv_cache as kvm
from mfa_tpu.models import llama

rng = np.random.default_rng(0)

# 1. flash fwd + grads bf16 (causal, GQA) vs oracle
B,Hq,Hkv,R,C,D = 1,4,2,512,768,128
q = jnp.asarray(rng.standard_normal((B,Hq,R,D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B,Hkv,C,D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B,Hkv,C,D)), jnp.bfloat16)
do = jnp.asarray(rng.standard_normal((B,Hq,R,D)), jnp.bfloat16)
def loss(q,k,v):
    return jnp.sum(flash_attention(q,k,v,causal=True).astype(jnp.float32)
                   * do.astype(jnp.float32))
o = flash_attention(q,k,v,causal=True)
gq, gk, gv = jax.grad(loss, argnums=(0,1,2))(q,k,v)
qf,kf,vf,dof = (x.astype(jnp.float32) for x in (q,k,v,do))
ofp, _ = attention_reference(qf,kf,vf,causal=True)
gqr, gkr, gvr, _ = attention_grads_reference(qf,kf,vf,dof,causal=True)
for name, a, b_ in [("O",o,ofp),("dQ",gq,gqr),("dK",gk,gkr),("dV",gv,gvr)]:
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)-b_)))
    print(f"{name} maxabs {err:.2e}"); assert err < 5e-2, name

# 2. decode attention: fp8 + int8 + bf16 caches vs dequantized-cache oracle
for prec, budget in [(OperandPrecision.FP8_E4M3, 6e-2),
                     (OperandPrecision.INT8, 6e-2),
                     (OperandPrecision.BF16, 2e-2)]:
    c = kvm.create(2, 2, 1024, 128, prec)
    kk = jnp.asarray(rng.standard_normal((2,2,700,128))*0.5, jnp.bfloat16)
    vv = jnp.asarray(rng.standard_normal((2,2,700,128))*0.5, jnp.bfloat16)
    c = kvm.update(c, kk, vv)
    qd = jnp.asarray(rng.standard_normal((2,8,128)), jnp.bfloat16)
    od = decode_attention(qd, c, interpret=False)
    kdq, vdq = c.dequant()
    kd = np.asarray(kdq)
    vd = np.asarray(vdq)
    errs = []
    for i in (0, 1):
        want, _ = attention_reference(
            np.asarray(qd, np.float32)[i:i+1, :, None, :],
            kd[i:i+1, :, :700], vd[i:i+1, :, :700])
        errs.append(float(np.max(np.abs(
            np.asarray(od, np.float32)[i, :, None, :] - want[0]))))
    err = max(errs)
    print(f"decode {prec.value} maxabs {err:.2e}"); assert err < budget, prec

# 3. llama forward + decode_step end-to-end on chip
cfg = llama.LlamaConfig(vocab_size=512, dim=256, n_layers=2, n_heads=4,
                        n_kv_heads=2, ffn_hidden=512)
params = llama.init_params(jax.random.key(0), cfg, jnp.bfloat16)
caches = llama.make_caches(cfg, 2, 256, OperandPrecision.INT8)
toks = jnp.asarray([[1,2,3,4,5,6,7,8],[4,5,6,7,8,9,10,11]], jnp.int32)
logits, caches = jax.jit(lambda p,t,c: llama.forward(p,cfg,t,caches=c))(params, toks, caches)
np.asarray(logits[...,:1])
l2, caches = jax.jit(lambda p,t,c: llama.decode_step(p,cfg,t,c))(params, jnp.asarray([3,4],jnp.int32), caches)
assert np.isfinite(np.asarray(l2)).all()
assert int(caches[0].lengths[0]) == 9
print("llama forward+decode_step on chip ok")
print("DRIVE PASS")
