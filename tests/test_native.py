"""Native C++ host runtime (plutus_halo2_tpu/native) vs the pure-Python spec.

The native library carries the prover's NTT hot loops; any deviation from the
Python bigint implementation would silently corrupt proofs, so everything is
checked bit-exact on random data."""

import random

import pytest

from plutus_halo2_tpu import native
from plutus_halo2_tpu.refimpl.field import Q
from plutus_halo2_tpu.refimpl import poly

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")

rng = random.Random(1234)


def _rand(n):
    return [rng.randrange(Q) for _ in range(n)]


def _py_ntt(a, omega):
    n = len(a)
    return [sum(a[i] * pow(omega, i * j, Q) for i in range(n)) % Q for j in range(n)]


def test_ntt_bit_exact_small():
    omega = poly.domain_omega(3)
    a = _rand(8)
    assert native.ntt(a, omega) == _py_ntt(a, omega)


def test_ntt_matches_python_path_large():
    k = 9
    omega = poly.domain_omega(k)
    a = _rand(1 << k)
    nat = native.ntt(a, omega)
    import plutus_halo2_tpu.refimpl.poly as p

    old = p._NATIVE_MIN_N
    p._NATIVE_MIN_N = 1 << 30  # force the pure-Python path
    try:
        py = poly.ntt(list(a), omega)
    finally:
        p._NATIVE_MIN_N = old
    assert nat == py


def test_ntt_roundtrip():
    k = 8
    omega = poly.domain_omega(k)
    a = _rand(1 << k)
    assert poly.intt(poly.ntt(list(a), omega), omega) == a


def test_pointwise_ops():
    a, b = _rand(200), _rand(200)
    assert native.mul_array(a, b) == [x * y % Q for x, y in zip(a, b)]
    k = rng.randrange(Q)
    assert native.scale_array(a, k) == [x * k % Q for x in a]
    got = native.powers_mul_array(a, k)
    want = [x * pow(k, i, Q) % Q for i, x in enumerate(a)]
    assert got == want


def test_coset_lde_roundtrip():
    k, ext_k = 5, 7
    omega = poly.domain_omega(k)
    ext_omega = poly.domain_omega(ext_k)
    coeffs = _rand(1 << k)
    values = poly.coset_evaluate(coeffs, 1 << ext_k, ext_omega)
    back = poly.coset_interpolate(values, ext_omega)
    assert back[: 1 << k] == coeffs
    assert all(c == 0 for c in back[1 << k :])
