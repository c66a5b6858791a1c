"""Polynomial arithmetic over Fr: radix-2 NTT, coset LDE, domains.

Spec-side machinery for the native prover (the reference delegates proving to
its halo2 fork; here it is first-class). All values are Python ints mod Q."""

from __future__ import annotations

from .field import Q, FR_GENERATOR, FR_ROOT_OF_UNITY, FR_TWO_ADICITY, fr_inv
from .. import native

# Below this size the ctypes pack/unpack overhead beats the C++ win.
_NATIVE_MIN_N = 128


def domain_omega(k: int) -> int:
    """Primitive 2^k-th root of unity (halo2 EvaluationDomain omega)."""
    assert k <= FR_TWO_ADICITY
    return pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), Q)


def _bit_reverse(a: list[int]) -> list[int]:
    n = len(a)
    j = 0
    a = list(a)
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    return a


def ntt(a: list[int], omega: int) -> list[int]:
    """In-order radix-2 NTT: a_j -> sum_i a_i omega^{ij}."""
    n = len(a)
    assert n & (n - 1) == 0
    if n >= _NATIVE_MIN_N:
        out = native.ntt(a, omega)
        if out is not None:
            return out
    a = _bit_reverse(a)
    length = 2
    while length <= n:
        w_len = pow(omega, n // length, Q)
        for start in range(0, n, length):
            w = 1
            half = length >> 1
            for j in range(start, start + half):
                u = a[j]
                v = a[j + half] * w % Q
                a[j] = (u + v) % Q
                a[j + half] = (u - v) % Q
                w = w * w_len % Q
        length <<= 1
    return a


def intt(a: list[int], omega: int) -> list[int]:
    n = len(a)
    inv_n = fr_inv(n)
    out = ntt(a, fr_inv(omega))
    return poly_scale(out, inv_n)


def lagrange_to_coeff(values: list[int], omega: int) -> list[int]:
    """Interpolate values over the domain {omega^i} -> coefficient form."""
    return intt(values, omega)


def coeff_to_lagrange(coeffs: list[int], omega: int) -> list[int]:
    return ntt(list(coeffs), omega)


def coset_evaluate(coeffs: list[int], ext_size: int, ext_omega: int, coset: int = FR_GENERATOR) -> list[int]:
    """Evaluate a polynomial on the coset {c * ext_omega^i} of size ext_size."""
    assert len(coeffs) <= ext_size
    scaled = list(coeffs) + [0] * (ext_size - len(coeffs))
    if len(coeffs) >= _NATIVE_MIN_N:
        weighted = native.powers_mul_array(coeffs, coset)
        if weighted is not None:
            scaled[: len(coeffs)] = weighted
            return ntt(scaled, ext_omega)
    c_pow = 1
    for i in range(len(coeffs)):
        scaled[i] = scaled[i] * c_pow % Q
        c_pow = c_pow * coset % Q
    return ntt(scaled, ext_omega)


def coset_interpolate(values: list[int], ext_omega: int, coset: int = FR_GENERATOR) -> list[int]:
    coeffs = intt(list(values), ext_omega)
    c_inv = fr_inv(coset)
    if len(coeffs) >= _NATIVE_MIN_N:
        weighted = native.powers_mul_array(coeffs, c_inv)
        if weighted is not None:
            return weighted
    c_pow = 1
    for i in range(len(coeffs)):
        coeffs[i] = coeffs[i] * c_pow % Q
        c_pow = c_pow * c_inv % Q
    return coeffs


def poly_eval(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % Q
    return acc


def poly_divide_linear(coeffs: list[int], z: int) -> list[int]:
    """Exact division by (X - z); the caller guarantees p(z) == 0
    (used for multiopen witness polynomials)."""
    out = [0] * (len(coeffs) - 1)
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc + coeffs[i]) % Q
        out[i - 1] = acc
        acc = acc * z % Q
    return out


def poly_add(a: list[int], b: list[int]) -> list[int]:
    n = max(len(a), len(b))
    a = list(a) + [0] * (n - len(a))
    b = list(b) + [0] * (n - len(b))
    return [(x + y) % Q for x, y in zip(a, b)]


def poly_scale(a: list[int], k: int) -> list[int]:
    if len(a) >= _NATIVE_MIN_N:
        out = native.scale_array(a, k)
        if out is not None:
            return out
    return [x * k % Q for x in a]


def lagrange_basis_coeffs(n: int, omega: int, row: int) -> list[int]:
    """Coefficients of l_row(X) over the size-n domain."""
    vals = [0] * n
    vals[row] = 1
    return lagrange_to_coeff(vals, omega)
