"""Native (C++) host-math runtime: build-on-first-import + ctypes bindings.

The context/keygen precompute (twiddle tables, Shoup words, prime search,
RNS decomposition) is pure host work the reference does in C++
(include/host/*); here it compiles once from tpu_fhe/native/src/ into a
cached shared library and binds via ctypes.  Every function has an exact
Python fallback (core/ntt_tables.py, core/numth.py) — set
TPU_FHE_NO_NATIVE=1 to force it.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "host_math.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "TPU_FHE_NATIVE_CACHE", os.path.join("/tmp", "tpu_fhe_native")
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"libhostmath-{digest}.so")
    if not os.path.exists(so):
        tmp = so + f".build-{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, so)
    lib = ctypes.CDLL(so)

    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.powers_bitrev.argtypes = [
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint32, u64p]
    lib.powers_natural.argtypes = [
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_size_t, u64p]
    lib.shoup_vec.argtypes = [
        u64p, ctypes.c_uint64, ctypes.c_size_t, u64p]
    lib.is_prime_u64.argtypes = [ctypes.c_uint64]
    lib.is_prime_u64.restype = ctypes.c_int
    lib.find_ntt_primes.argtypes = [
        ctypes.c_uint64, ctypes.c_uint32, ctypes.c_size_t, u64p,
        ctypes.c_size_t, u64p]
    lib.find_ntt_primes.restype = ctypes.c_size_t
    lib.decompose_i128.argtypes = [
        u64p, i64p, ctypes.c_size_t, u64p, ctypes.c_size_t, u64p]
    return lib


def get_lib():
    """The loaded native library, or None (fallbacks engage)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        if os.environ.get("TPU_FHE_NO_NATIVE"):
            _TRIED = True
            return None
        try:
            _LIB = _build_and_load()
        except Exception as exc:  # pragma: no cover
            print(f"[tpu-fhe] native host math unavailable ({exc}); "
                  f"using Python fallback", file=sys.stderr)
            _LIB = None
        _TRIED = True
        return _LIB


def _ptr(a: np.ndarray, typ=ctypes.c_uint64):
    return a.ctypes.data_as(ctypes.POINTER(typ))


# -- vectorized entry points (None-returning if native is unavailable) -------

def powers_bitrev(base: int, q: int, log_n: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(1 << log_n, dtype=np.uint64)
    lib.powers_bitrev(base, q, log_n, _ptr(out))
    return out


def shoup_vec(w: np.ndarray, q: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, dtype=np.uint64)
    out = np.empty(w.size, dtype=np.uint64)
    lib.shoup_vec(_ptr(w), q, w.size, _ptr(out))
    return out.reshape(w.shape)


def find_ntt_primes(
    ntt_size: int, bit_size: int, count: int, exclude=()
) -> list[int] | None:
    lib = get_lib()
    if lib is None:
        return None
    excl = np.asarray(sorted(exclude), dtype=np.uint64)
    out = np.empty(count, dtype=np.uint64)
    got = lib.find_ntt_primes(
        ntt_size, bit_size, count,
        _ptr(excl) if excl.size else _ptr(np.empty(1, dtype=np.uint64)),
        excl.size, _ptr(out),
    )
    if got < count:
        return None  # caller's fallback raises the proper error
    return [int(v) for v in out]


def decompose_i128(lo: np.ndarray, hi: np.ndarray, qs: list[int]) -> np.ndarray | None:
    """Signed 128-bit coeffs (lo u64 word, hi i64 word) -> (L, N) residues."""
    lib = get_lib()
    if lib is None:
        return None
    lo = np.ascontiguousarray(lo, dtype=np.uint64)
    hi = np.ascontiguousarray(hi, dtype=np.int64)
    q = np.asarray(qs, dtype=np.uint64)
    out = np.empty((len(qs), lo.size), dtype=np.uint64)
    lib.decompose_i128(
        _ptr(lo), _ptr(hi, ctypes.c_int64), lo.size, _ptr(q), len(qs), _ptr(out)
    )
    return out
