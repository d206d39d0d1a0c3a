"""C++ config core ↔ Python twin consistency (the native-equivalence layer,
SURVEY.md §2.3). Skips cleanly when no toolchain is available."""

import subprocess
from pathlib import Path

import pytest

from mfa_tpu.ops import native, params
from mfa_tpu.ops.descriptors import GEMMDescriptor

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native runtime unavailable")


def test_parse_table_matches_python():
    for key, text in params._TABLES.items():
        py_rows = params.parse_table(text)
        c_rows = native.parse_table(text)
        assert len(py_rows) == len(c_rows), key
        for pr, cr in zip(py_rows, c_rows):
            assert pr.max_d == cr["max_d"]
            assert pr.block_q == cr["block_q"]
            assert pr.block_kv == cr["block_kv"]
            assert pr.block_d == cr["block_d"]
            assert pr.vmem_resident == cr["vmem_resident"]


def test_parse_rejects_malformed():
    with pytest.raises(ValueError, match="malformed|unbounded"):
        native.parse_table("64 | 1 | 1")


def test_gemm_blocks_match_python():
    for shape in [(64, 64, 64), (512, 512, 512), (4096, 4096, 4096),
                  (7, 200, 130)]:
        for in_bytes in (2.0, 4.0):
            prec = (params.GENERATIONS["v5e"], )
            desc = GEMMDescriptor(m=shape[0], n=shape[1], k=shape[2])
            # Python heuristic uses max(a_bytes, b_bytes) = in_bytes when
            # both operands share a precision; emulate via native call.
            got = native.gemm_blocks(*shape, in_bytes, in_bytes, "v5e")
            # Recompute the Python side with the same in_bytes by direct
            # formula (GEMMDescriptor assumes fp32; compare at 4 bytes).
            if in_bytes == 4.0:
                kd = desc.kernel_descriptor(params.GENERATIONS["v5e"])
                assert got == (kd.block_m, kd.block_n, kd.block_k)
            else:
                bm, bn, bk = got
                assert bm * bn * 4 + 2 * in_bytes * bk * (bm + bn) \
                    <= params.GENERATIONS["v5e"].vmem_bytes * 0.7


def test_hash_stability():
    h1 = native.hash_bytes(b"attention-kernel-key")
    h2 = native.hash_bytes(b"attention-kernel-key")
    h3 = native.hash_bytes(b"attention-kernel-kez")
    assert h1 == h2
    assert h1 != h3
    assert h1 != 0


def test_host_bench_budget():
    """The native host-path benchmark must meet the reference's ~1 us
    descriptor-derivation budget (GEMMDescriptor.swift:105)."""
    exe = Path(native._RUNTIME_DIR) / "build" / "mfa_host_bench"
    if not exe.exists():
        subprocess.run(["make", "-C", str(native._RUNTIME_DIR)], check=True,
                       capture_output=True)
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=120)
    assert out.returncode == 0, out.stderr
    assert "host-path budget OK" in out.stdout


def test_pjrt_driver_links():
    """The native DEVICE driver must stay buildable (round-4 verdict: the
    pjrt link line silently rotted because nothing guarded it — the driver
    had never been built). Build-only here; the end-to-end device run is
    the round-5 MEASUREMENTS artifact (182 TF/s at 1488^3 bf16)."""
    out = subprocess.run(["make", "-C", str(native._RUNTIME_DIR), "pjrt"],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert (Path(native._RUNTIME_DIR) / "build" / "pjrt_driver").exists()


# ---------------------------------------------------------------------------
# C++ GEMM codegen → XLA compile → execute (runtime/gemm_emitter.cpp): the
# native-side kernel-source path, the analogue of the reference's C++ MSL
# emitter + GEMMShaderCache compile flow (GEMMKernel.cpp, GEMMShaderCache.cpp).
# ---------------------------------------------------------------------------


def _compile_and_run(text: str, arrays):
    import jax
    import numpy as np
    from jax._src import compiler as jcompiler
    from jax._src.interpreters import mlir as jmlir
    from jaxlib import _jax
    from jaxlib.mlir import ir

    backend = jax.devices()[0].client
    devs = _jax.DeviceList(tuple(jax.devices()[:1]))
    with jmlir.make_ir_context() as ctx:
        mod = ir.Module.parse(text, ctx)
        opts = jcompiler.get_compile_options(num_replicas=1, num_partitions=1)
        ex = backend.compile_and_load(mod, devs, opts)
    out = ex.execute_sharded(
        [backend.buffer_from_pyval(x) for x in arrays])
    return np.asarray(out.disassemble_into_single_device_arrays()[0][0])


@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True), (True, True)])
def test_emitted_gemm_executes(ta, tb):
    import numpy as np

    from mfa_tpu.ops import native

    m, n, k = 48, 80, 56
    text = native.emit_gemm(m, n, k, transpose_a=ta, transpose_b=tb)
    assert "stablehlo.dot_general" in text
    rng = np.random.default_rng(0)
    a = rng.standard_normal((k, m) if ta else (m, k)).astype(np.float32)
    b = rng.standard_normal((n, k) if tb else (k, n)).astype(np.float32)
    got = _compile_and_run(text, (a, b))
    want = (a.T if ta else a) @ (b.T if tb else b)
    assert np.abs(got - want).max() < 1e-4


def test_emitted_gemm_accumulate_bf16_batch():
    import numpy as np

    from mfa_tpu.ops import native

    text = native.emit_gemm(32, 32, 64, batch=2, load_previous_c=True,
                            a_bf16=True, b_bf16=True)
    assert "xbf16" in text and "batching_dims" in text
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((2, 32, 64)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((2, 64, 32)), jnp.bfloat16)
    c0 = rng.standard_normal((2, 32, 32)).astype(np.float32)
    got = _compile_and_run(text, (np.asarray(a), np.asarray(b), c0))
    want = np.asarray(a, np.float32) @ np.asarray(b, np.float32) + c0
    assert np.abs(got - want).max() < 5e-2


def test_emitted_gemm_k_split_structure_and_numerics():
    """Blocked emission: explicit blocks must show up as the pad granularity
    and an unrolled K-split (nk partial dot_generals chained through f32
    adds — the graph twin of the Pallas kernel's scratch K loop)."""
    import numpy as np

    from mfa_tpu.ops import native

    m, n, k = 130, 70, 300           # pads to 256 x 128 x 384 at 128-blocks
    text = native.emit_gemm(m, n, k, blocks=(128, 128, 128))
    assert text.count("stablehlo.dot_general") == 3     # ceil(300/128)
    assert text.count("stablehlo.pad") >= 2             # both operands padded
    assert "stablehlo.slice" in text                    # k-slices + result

    rng = np.random.default_rng(2)
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    got = _compile_and_run(text, (a, b))
    assert np.abs(got - a @ b).max() < 1e-3


def test_emitted_gemm_heuristic_blocks_default():
    """With no explicit blocks the emitter must run the same VMEM-budget
    heuristic as the dispatch path (C++ twin), so large problems get a
    K-split without the caller asking."""
    from mfa_tpu.ops import native, params
    from mfa_tpu.ops.descriptors import GEMMDescriptor

    m = n = k = 4096
    kd = GEMMDescriptor(m=m, n=n, k=k).kernel_descriptor(
        params.GENERATIONS["v5e"])
    text = native.emit_gemm(m, n, k)
    want_nk = -(-k // kd.block_k)
    assert text.count("stablehlo.dot_general") == want_nk
