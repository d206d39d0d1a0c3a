"""GEMM kernel vs jnp oracle.

Mirrors the reference's GEMM tests: LaplacianTest's 38 block-boundary sizes
x 3 transpose states (LaplacianTest.swift:6-41) and AdversarialShapeTest's
randomized fuzz (random shapes/precisions/transposes/loadPreviousC,
AdversarialShapeTest.swift:12-66), shrunk to CPU-interpret scale."""

import jax.numpy as jnp
import numpy as np
import pytest

from mfa_tpu.ops.gemm import gemm
from mfa_tpu.utils.testing import assert_close


def _oracle(a, b, c0=None, ta=False, tb=False):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if ta:
        a = np.swapaxes(a, -1, -2)
    if tb:
        b = np.swapaxes(b, -1, -2)
    c = a @ b
    if c0 is not None:
        c = c + np.asarray(c0, np.float32)
    return c


# Block-boundary straddling sizes (LaplacianTest.swift:6-41 straddles 7..153
# around its 32/48 blocks; our blocks are 128-multiples).
SIZES = [7, 64, 127, 128, 129, 200]


@pytest.mark.parametrize("n", SIZES)
def test_square(rng, n):
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    assert_close(gemm(a, b), _oracle(a, b), 1e-4 * max(1, n / 64), f"C {n}^2")


@pytest.mark.parametrize("ta", [False, True])
@pytest.mark.parametrize("tb", [False, True])
def test_transpose_states(rng, ta, tb):
    m, k, n = 65, 130, 33
    a_shape = (k, m) if ta else (m, k)
    b_shape = (n, k) if tb else (k, n)
    a = jnp.asarray(rng.standard_normal(a_shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(b_shape), jnp.float32)
    got = gemm(a, b, transpose_a=ta, transpose_b=tb)
    assert_close(got, _oracle(a, b, ta=ta, tb=tb), 5e-4, f"C T{ta}{tb}")


def test_accumulate(rng):
    """load_previous_C path (GEMMDescriptor.swift:42-47)."""
    m, k, n = 40, 50, 60
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    got = gemm(a, b, c0)
    assert_close(got, _oracle(a, b, c0), 5e-4, "C +=")


def test_batched(rng):
    a = jnp.asarray(rng.standard_normal((3, 17, 29)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, 29, 23)), jnp.float32)
    assert_close(gemm(a, b), _oracle(a, b), 5e-4, "C batched")


def test_bf16(rng):
    m = 96
    a = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
    got = gemm(a, b, out_dtype=jnp.float32)
    assert_close(got, _oracle(a, b), 0.5, "C bf16")


def test_fuzz(rng):
    """Random shapes with small-size bias (cubed-uniform like
    AdversarialShapeTest.swift:12-66), random transposes, random accumulate."""
    for _ in range(6):
        m, n, k = (int(rng.uniform(0, 1) ** 3 * 200) + 1 for _ in range(3))
        ta, tb = bool(rng.integers(2)), bool(rng.integers(2))
        acc = bool(rng.integers(2))
        a = jnp.asarray(
            rng.standard_normal((k, m) if ta else (m, k)), jnp.float32)
        b = jnp.asarray(
            rng.standard_normal((n, k) if tb else (k, n)), jnp.float32)
        c0 = (jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
              if acc else None)
        got = gemm(a, b, c0, transpose_a=ta, transpose_b=tb)
        assert_close(
            got, _oracle(a, b, c0, ta, tb), 1e-3,
            f"fuzz m={m} n={n} k={k} ta={ta} tb={tb} acc={acc}",
        )


# ---------------------------------------------------------------------------
# Adversarial randomized fuzz (AdversarialShapeTest.swift:12-66): random
# M,N,K cubed-uniform (biased small), random per-operand precisions, random
# transposes, random loadPreviousC, and operands embedded in OVER-SIZED
# buffers (the padded-leading-dimension analogue: the kernel must respect
# logical bounds, not buffer bounds). Dense matmul oracle with the
# accumulation-length tolerance model (AdversarialShapeTest.swift:288-336).
# Scaled to CPU-interpret budget: 12 trials, dims in [1, 384].
# ---------------------------------------------------------------------------

_DTYPES = [jnp.float32, jnp.bfloat16]


def _tolerance(dtypes, k):
    """Precision-aware tolerance with accumulation-length scaling."""
    if all(dt == jnp.float32 for dt in dtypes):
        base = 2e-5
    else:
        base = 5e-2
    return base * max(1.0, k / 256.0) * 3.0


def _cubed_dim(r, lo=1, hi=384):
    u = r.uniform()
    return int(lo + (hi - lo) * u ** 3)


def test_adversarial_fuzz(rng):
    for trial in range(12):
        m, n, k = (_cubed_dim(rng) for _ in range(3))
        ta, tb = bool(rng.integers(2)), bool(rng.integers(2))
        with_c0 = bool(rng.integers(2))
        a_dt = _DTYPES[rng.integers(len(_DTYPES))]
        b_dt = _DTYPES[rng.integers(len(_DTYPES))]

        a_shape = (k, m) if ta else (m, k)
        b_shape = (n, k) if tb else (k, n)

        # Over-sized buffers: generate into a larger allocation, slice the
        # logical operand out — the padded-stride adversary.
        def embedded(shape, dt):
            big = jnp.asarray(
                rng.standard_normal((shape[0] + int(rng.integers(1, 9)),
                                     shape[1] + int(rng.integers(1, 9)))),
                dt)
            return big[:shape[0], :shape[1]]

        a = embedded(a_shape, a_dt)
        b = embedded(b_shape, b_dt)
        c0 = embedded((m, n), jnp.float32) if with_c0 else None

        got = gemm(a, b, c0, transpose_a=ta, transpose_b=tb,
                   out_dtype=jnp.float32)
        want = _oracle(a, b, c0, ta=ta, tb=tb)
        tol = _tolerance((a_dt, b_dt), k)
        assert_close(
            got, want, tol,
            f"fuzz[{trial}] m={m} n={n} k={k} ta={ta} tb={tb} "
            f"c0={with_c0} {a_dt.__name__}/{b_dt.__name__}")


# ---------------------------------------------------------------------------
# Dispatch-path autotune hook (GEMMDescriptor+PipelineCache.swift:75-119)
# ---------------------------------------------------------------------------


def test_autotune_hook_selects_and_memoizes():
    """On the first dispatch of a shape class the hook measures candidates
    and memoizes the winner; later dispatches reuse it without measuring."""
    import dataclasses

    from mfa_tpu.ops import gemm as gemm_mod
    from mfa_tpu.ops.descriptors import GEMMDescriptor
    from mfa_tpu.ops.precision import OperandPrecision

    desc = GEMMDescriptor(
        m=512, n=512, k=512,
        a_precision=OperandPrecision.BF16,
        b_precision=OperandPrecision.BF16,
        c_precision=OperandPrecision.BF16,
    )
    kd = desc.kernel_descriptor()
    a = jnp.zeros((1, 512, 512), jnp.bfloat16)

    calls = []

    def fake_measure(cand_kd):
        calls.append((cand_kd.block_m, cand_kd.block_n, cand_kd.block_k))
        # Pretend the smallest block_k candidate wins.
        return float(cand_kd.block_k)

    gemm_mod._tuned_blocks.clear()
    tuned = gemm_mod._autotuned_kd(kd, desc, a, a, None, jnp.bfloat16,
                                   measure=fake_measure)
    assert len(calls) >= 2                       # probed >1 candidate
    assert tuned.block_k == min(c[2] for c in calls)   # the fake winner
    assert tuned.block_k < kd.block_k            # beat the heuristic
    assert (kd.block_m, kd.block_n, kd.block_k) in calls  # heuristic probed

    # Second resolve: memo hit, no measuring.
    calls.clear()
    tuned2 = gemm_mod._autotuned_kd(kd, desc, a, a, None, jnp.bfloat16,
                                    measure=fake_measure)
    assert calls == []
    assert tuned2 == tuned
    gemm_mod._tuned_blocks.clear()


def test_autotune_candidates_cover_heuristic_and_axes():
    from mfa_tpu.ops import gemm as gemm_mod
    from mfa_tpu.ops.descriptors import GEMMDescriptor
    from mfa_tpu.ops.precision import OperandPrecision

    desc = GEMMDescriptor(
        m=1536, n=1536, k=1536,
        a_precision=OperandPrecision.BF16,
        b_precision=OperandPrecision.BF16,
        c_precision=OperandPrecision.BF16,
    )
    kd = desc.kernel_descriptor()
    cands = gemm_mod._autotune_candidates(kd, desc.m, desc.n, desc.k)
    assert (kd.block_m, kd.block_n, kd.block_k) in cands
    assert len(set(cands)) == len(cands)         # deduped
    assert 2 <= len(cands) <= 8


def test_large_volume_heuristic_whole_k():
    """Volumes >=1152^3 get the round-5 output-stationary whole-K
    macro-tiles (no k grid axis) when the slabs fit VMEM; small problems
    keep the k-blocked form."""
    from mfa_tpu.ops.descriptors import GEMMDescriptor, round_up
    from mfa_tpu.ops.params import GENERATIONS
    from mfa_tpu.ops.precision import OperandPrecision

    prec = OperandPrecision.BF16
    gen = GENERATIONS["v5e"]
    big = GEMMDescriptor(m=1488, n=1488, k=1488, a_precision=prec,
                         b_precision=prec, c_precision=prec)
    kd = big.kernel_descriptor(gen)
    assert kd.block_k == round_up(1488, 128)       # whole K
    assert kd.block_m == kd.block_n == 768         # measured macro-tile
    # Slabs must fit the budget the heuristic claims (0.78 whole-K gate).
    assert (kd.block_m * kd.block_n * 4
            + 2 * 2 * kd.block_k * (kd.block_m + kd.block_n)
            <= gen.vmem_bytes * 0.78)

    small = GEMMDescriptor(m=512, n=512, k=512, a_precision=prec,
                           b_precision=prec, c_precision=prec)
    kds = small.kernel_descriptor(gen)
    assert kds.block_k <= 512                      # k-blocked path intact

    # Huge K: whole-K slabs cannot fit — falls back to k-blocking.
    deep = GEMMDescriptor(m=4096, n=4096, k=16384, a_precision=prec,
                          b_precision=prec, c_precision=prec)
    kdd = deep.kernel_descriptor(gen)
    assert kdd.block_k < round_up(16384, 128)


def test_autotune_off_by_default(monkeypatch):
    from mfa_tpu.ops import gemm as gemm_mod

    monkeypatch.delenv("MFA_AUTOTUNE", raising=False)
    gemm_mod.set_autotune(None)
    assert not gemm_mod.autotune_active()
    monkeypatch.setenv("MFA_AUTOTUNE", "1")
    assert gemm_mod.autotune_active()
    gemm_mod.set_autotune(False)
    assert not gemm_mod.autotune_active()
    gemm_mod.set_autotune(None)
