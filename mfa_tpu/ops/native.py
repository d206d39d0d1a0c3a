"""ctypes bridge to the C++ kernel-config core (runtime/).

The reference maintains its native C++ twin of the Swift config layer
(Documentation/CppReference — descriptors, heuristics, shader cache); ours
is built from runtime/*.cpp into libmfa_runtime.so and used by the Python
layer when available (parse/selection/heuristics produce bit-identical
results; tests/test_native.py locks the two implementations together).

Loading is lazy and failure-tolerant: no compiler or missing .so degrades
to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_RUNTIME_DIR = Path(__file__).resolve().parents[2] / "runtime"
_LIB_PATH = _RUNTIME_DIR / "build" / "libmfa_runtime.so"

_lib = None
_load_attempted = False


class MfaRow(ctypes.Structure):
    _fields_ = [
        ("max_d", ctypes.c_int),
        ("block_q", ctypes.c_int),
        ("block_kv", ctypes.c_int),
        ("block_d", ctypes.c_int),
        ("vmem_resident", ctypes.c_char * 96),
    ]


def _try_build() -> bool:
    if not (_RUNTIME_DIR / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_RUNTIME_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def load():
    """Returns the ctypes library or None."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("MFA_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists() and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    try:
        _bind(lib)
    except AttributeError:
        # A stale prebuilt libmfa missing a newer symbol must degrade to
        # "native runtime unavailable" (the documented contract), not leak
        # an AttributeError to every native-runtime caller. A rebuild
        # (make -C runtime) picks the new symbols up.
        return None
    _lib = lib
    return _lib


def _bind(lib):
    lib.mfa_parse_table.restype = ctypes.c_int
    lib.mfa_parse_table.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(MfaRow), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.mfa_select_row.restype = ctypes.c_int
    lib.mfa_select_row.argtypes = [
        ctypes.POINTER(MfaRow), ctypes.c_int, ctypes.c_int]
    lib.mfa_vmem_bytes_estimate.restype = ctypes.c_longlong
    lib.mfa_vmem_bytes_estimate.argtypes = [
        ctypes.POINTER(MfaRow), ctypes.c_int, ctypes.c_double,
        ctypes.c_char_p]
    lib.mfa_gemm_blocks.restype = None
    lib.mfa_gemm_blocks.argtypes = [
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_double, ctypes.c_double, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mfa_hash_bytes.restype = ctypes.c_ulonglong
    lib.mfa_hash_bytes.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
    lib.mfa_emit_gemm.restype = ctypes.c_longlong
    lib.mfa_emit_gemm.argtypes = [
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_longlong, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_longlong,
    ]
    lib.mfa_emit_gemm_blocked.restype = ctypes.c_longlong
    lib.mfa_emit_gemm_blocked.argtypes = [
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_longlong, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_longlong,
    ]


def parse_table(text: str):
    """Native table parse → list of row dicts, or None if unavailable."""
    lib = load()
    if lib is None:
        return None
    rows = (MfaRow * 64)()
    err = ctypes.create_string_buffer(256)
    n = lib.mfa_parse_table(text.encode(), rows, 64, err, 256)
    if n < 0:
        raise ValueError(err.value.decode())
    out = []
    for i in range(n):
        ops = rows[i].vmem_resident.decode()
        out.append({
            "max_d": rows[i].max_d,
            "block_q": rows[i].block_q,
            "block_kv": rows[i].block_kv,
            "block_d": rows[i].block_d,
            "vmem_resident": tuple(o for o in ops.split(",") if o),
        })
    return out


def gemm_blocks(m: int, n: int, k: int, a_bytes: float, b_bytes: float,
                generation: str):
    lib = load()
    if lib is None:
        return None
    bm = ctypes.c_int()
    bn = ctypes.c_int()
    bk = ctypes.c_int()
    lib.mfa_gemm_blocks(m, n, k, a_bytes, b_bytes, generation.encode(),
                        ctypes.byref(bm), ctypes.byref(bn), ctypes.byref(bk))
    return bm.value, bn.value, bk.value


def hash_bytes(data: bytes) -> int | None:
    lib = load()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(data, len(data))
    return lib.mfa_hash_bytes(ctypes.cast(buf, ctypes.c_void_p), len(data))


def emit_gemm(m: int, n: int, k: int, *, batch: int = 1,
              transpose_a: bool = False, transpose_b: bool = False,
              load_previous_c: bool = False, a_bf16: bool = False,
              b_bf16: bool = False, c_bf16: bool = False,
              blocks: tuple | None = None):
    """C++-side GEMM codegen: descriptor → StableHLO module text.

    The native twin of the reference's C++ MSL emitter
    (Documentation/CppReference/GEMM/GEMMKernel.cpp) — see
    runtime/gemm_emitter.cpp. The emitted module is tiled by the kernel
    descriptor: ``blocks=(bm, bn, bk)`` drives pad granularity and the
    unrolled K-split; None runs the C++ VMEM-budget heuristic. Returns the
    module string, or None if the native runtime is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    bm, bn, bk = blocks if blocks else (0, 0, 0)

    def call(buf, cap):
        return lib.mfa_emit_gemm_blocked(
            m, n, k, batch, int(transpose_a), int(transpose_b),
            int(load_previous_c), int(a_bf16), int(b_bf16), int(c_bf16),
            bm, bn, bk, buf, cap)

    cap = 1 << 16
    buf = ctypes.create_string_buffer(cap)
    n_bytes = call(buf, cap)
    if n_bytes >= cap:
        buf = ctypes.create_string_buffer(n_bytes + 1)
        call(buf, n_bytes + 1)
    return buf.value.decode()
