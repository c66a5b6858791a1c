"""Native host runtime (C++ via ctypes) — see ph2_native.cpp.

The reference keeps its generator/runtime native (Rust crate,
src/plutus_gen/*); here the host-side prover hot loops (Fr NTT and pointwise
field ops driving quotient construction in refimpl/poly.py) are C++, compiled
on first use with g++ and loaded via ctypes. Everything has a pure-Python
fallback; set PH2_NATIVE=0 to force it."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

Q = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ph2_native.cpp")
_SO = os.path.join(_HERE, "_build", "libph2native.so")

_lock = threading.Lock()
_lib = None
_tried = False


_CFLAGS = ["-O3", "-shared", "-fPIC"]  # no -march=native: the cached .so may
# travel with the checkout to a different CPU (container images, shared homes)


def _so_path() -> str:
    """Cache key = hash of source + flags + platform, embedded in the
    filename, so compiler-flag or source changes (not just mtime) rebuild."""
    import hashlib
    import platform

    with open(_SRC, "rb") as f:
        src = f.read()
    key = hashlib.sha256(
        src + repr(_CFLAGS).encode() + platform.machine().encode()
    ).hexdigest()[:16]
    return os.path.join(_HERE, "_build", f"libph2native-{key}.so")


def _build() -> str | None:
    so = _so_path()
    os.makedirs(os.path.dirname(so), exist_ok=True)
    if os.path.exists(so):
        return so
    tmp = so + ".tmp"
    cmd = ["g++", *_CFLAGS, "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    os.replace(tmp, so)
    return so


def get_lib():
    """The loaded native library, or None (no compiler / disabled)."""
    global _lib, _tried
    if os.environ.get("PH2_NATIVE", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.fr_ntt.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p]
        lib.fr_mul_array.argtypes = [ctypes.c_char_p] * 3 + [ctypes.c_uint64]
        lib.fr_scale_array.argtypes = [ctypes.c_char_p] * 3 + [ctypes.c_uint64]
        lib.fr_powers_mul_array.argtypes = [ctypes.c_char_p] * 3 + [ctypes.c_uint64]
        lib.ph2_native_abi_version.restype = ctypes.c_int
        if lib.ph2_native_abi_version() != 1:
            return None
        _lib = lib
        return _lib


def _pack(values) -> bytes:
    # reduce mod Q first so the native path agrees with the pure-Python
    # fallbacks (which apply % Q) for unreduced or negative inputs
    return b"".join((v % Q).to_bytes(32, "little") for v in values)


def _unpack(buf: bytes, n: int) -> list[int]:
    return [int.from_bytes(buf[32 * i : 32 * i + 32], "little") for i in range(n)]


def available() -> bool:
    return get_lib() is not None


def ntt(values: list[int], omega: int) -> list[int] | None:
    """Native in-place NTT; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(values)
    buf = ctypes.create_string_buffer(_pack(values), 32 * n)
    lib.fr_ntt(buf, n, (omega % Q).to_bytes(32, "little"))
    return _unpack(buf.raw, n)


def mul_array(a: list[int], b: list[int]) -> list[int] | None:
    lib = get_lib()
    if lib is None:
        return None
    n = len(a)
    out = ctypes.create_string_buffer(32 * n)
    lib.fr_mul_array(_pack(a), _pack(b), out, n)
    return _unpack(out.raw, n)


def scale_array(a: list[int], k: int) -> list[int] | None:
    lib = get_lib()
    if lib is None:
        return None
    n = len(a)
    out = ctypes.create_string_buffer(32 * n)
    lib.fr_scale_array(_pack(a), (k % Q).to_bytes(32, "little"), out, n)
    return _unpack(out.raw, n)


def powers_mul_array(a: list[int], k: int) -> list[int] | None:
    """[a_i * k^i] — the coset weighting of coset_evaluate/interpolate."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(a)
    out = ctypes.create_string_buffer(32 * n)
    lib.fr_powers_mul_array(_pack(a), (k % Q).to_bytes(32, "little"), out, n)
    return _unpack(out.raw, n)
