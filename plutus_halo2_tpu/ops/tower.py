"""Batched Fp2 / Fp12 tower arithmetic for TPU (JAX).

Fp2  = Fp[u]/(u^2 + 1), elements shaped (..., 2, L).
Fp12 = Fp2[w]/(w^6 - xi) with xi = u + 1, elements shaped (..., 6, 2, L)
(coefficients of w^0..w^5). This flattened sextic-over-quadratic view makes
Frobenius a coefficient-wise conjugate-and-scale by host-precomputed
gamma constants, and keeps the multiplication a single batched pattern.

Compile-size discipline: an Fp12 product performs its 36 coefficient products
as ONE batched Karatsuba Fp2 multiply (3 Montgomery multiplies regardless of
batch), then reduces the w^6 overflow with xi and segment-sums raw limb
columns, deferring the modular reduction to a single Montgomery pass — so an
Fp12 mul costs ~6 montmul-equivalents of HLO instead of 108."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limb
from .limb import FP_SPEC, fp


# ---------------------------------------------------------------------------
# Fp2
# ---------------------------------------------------------------------------

def fp2_mul(a, b):
    """Karatsuba: 3 fp muls. a, b: (..., 2, L)."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    m0 = fp.mul(a0, b0)
    m1 = fp.mul(a1, b1)
    m2 = fp.mul(fp.add(a0, a1), fp.add(b0, b1))
    c0 = fp.sub(m0, m1)
    c1 = fp.sub(m2, fp.add(m0, m1))
    return jnp.stack([c0, c1], axis=-2)


def fp2_sqr(a):
    a0, a1 = a[..., 0, :], a[..., 1, :]
    t0 = fp.mul(fp.add(a0, a1), fp.sub(a0, a1))
    t1 = fp.mul(a0, a1)
    return jnp.stack([t0, fp.add(t1, t1)], axis=-2)


def fp2_add(a, b):
    return jnp.stack(
        [fp.add(a[..., 0, :], b[..., 0, :]), fp.add(a[..., 1, :], b[..., 1, :])],
        axis=-2,
    )


def fp2_sub(a, b):
    return jnp.stack(
        [fp.sub(a[..., 0, :], b[..., 0, :]), fp.sub(a[..., 1, :], b[..., 1, :])],
        axis=-2,
    )


def fp2_neg(a):
    return jnp.stack([fp.neg(a[..., 0, :]), fp.neg(a[..., 1, :])], axis=-2)


def fp2_conj(a):
    return jnp.stack([a[..., 0, :], fp.neg(a[..., 1, :])], axis=-2)


def fp2_mul_fp(a, s):
    """Multiply both components by an Fp scalar limb array."""
    return jnp.stack([fp.mul(a[..., 0, :], s), fp.mul(a[..., 1, :], s)], axis=-2)


def fp2_inv(a):
    """1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2); one Fermat chain."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    norm = fp.add(fp.mul(a0, a0), fp.mul(a1, a1))
    ninv = fp.inv(norm)
    return jnp.stack([fp.mul(a0, ninv), fp.neg(fp.mul(a1, ninv))], axis=-2)


def fp2_host_to_mont(c) -> np.ndarray:
    """Host: (c0, c1) ints -> (2, L) Montgomery limbs."""
    return np.stack([FP_SPEC.to_mont(c[0]), FP_SPEC.to_mont(c[1])])


def fp2_host_from_mont(arr) -> tuple:
    arr = np.asarray(arr)
    return (FP_SPEC.from_mont_int(arr[0]), FP_SPEC.from_mont_int(arr[1]))


# ---------------------------------------------------------------------------
# Fp12 over w, w^6 = xi = u + 1
# ---------------------------------------------------------------------------

# static product routing: 36 (i, j) pairs, output slot (i+j) mod 6, wrap flag
_IDX_I, _IDX_J = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
_IDX_I = _IDX_I.reshape(-1)
_IDX_J = _IDX_J.reshape(-1)
_OUT_SLOT = (_IDX_I + _IDX_J) % 6
_WRAP = ((_IDX_I + _IDX_J) >= 6).astype(np.uint32)
# routing matrices (36 -> 6), split by wrap so xi can be applied per group
_ROUTE_PLAIN = np.zeros((36, 6), dtype=np.int32)
_ROUTE_WRAP = np.zeros((36, 6), dtype=np.int32)
for _t in range(36):
    if _WRAP[_t]:
        _ROUTE_WRAP[_t, _OUT_SLOT[_t]] = 1
    else:
        _ROUTE_PLAIN[_t, _OUT_SLOT[_t]] = 1


def fp12_zero(shape=()):
    return jnp.zeros((*shape, 6, 2, FP_SPEC.L), dtype=jnp.uint32)


def fp12_one(shape=()):
    one = fp.one(shape)
    out = fp12_zero(shape)
    return out.at[..., 0, 0, :].set(one)


def _route_sum(products, route):
    """(..., 36, 2, L) raw-sum into (..., 6, 2, L) lazy columns via a static
    0/1 matmul (columns stay < 6 * 2^16 — safe for one reduction pass)."""
    return jnp.einsum(
        "...tcl,ts->...scl", products.astype(jnp.int32), jnp.asarray(route)
    ).astype(jnp.uint32)


def _reduce_lazy_fp(x):
    """Reduce lazy limb columns (< 2^20 per limb, value < 2^15 * N) back to a
    canonical field element: one Montgomery pass with b = R mod N (valid since
    a*b < 2^15*N*N << R*N). Two value-preserving folds first so limbs are
    <= 2^16 before the sublimb split (keeps conv columns within int32)."""
    one_mont = jnp.asarray(FP_SPEC.one_mont)
    x = limb._lazy_round(limb._lazy_round(x))
    return limb.mont_mul(FP_SPEC, x, one_mont)


def fp12_mul(a, b):
    """(..., 6, 2, L) x (..., 6, 2, L): one batched fp2 Karatsuba over the 36
    coefficient pairs + xi-wrap + routed lazy sums + single reduction."""
    ai = a[..., jnp.asarray(_IDX_I), :, :]  # (..., 36, 2, L)
    bj = b[..., jnp.asarray(_IDX_J), :, :]
    prods = fp2_mul(ai, bj)  # batched: 3 montmuls total
    # xi * p = (p0 - p1, p0 + p1) for the wrapped products
    p0, p1 = prods[..., 0, :], prods[..., 1, :]
    xi_p = jnp.stack([fp.sub(p0, p1), fp.add(p0, p1)], axis=-2)
    plain = _route_sum(prods, _ROUTE_PLAIN)
    wrap = _route_sum(xi_p, _ROUTE_WRAP)
    lazy = plain + wrap  # limbs < 6 * 2^16 + carry slack
    return _reduce_lazy_fp(lazy)


def fp12_sqr(a):
    return fp12_mul(a, a)


def fp12_mul_sparse023(f, c0, c2, c3):
    """Multiply f by a line value l = c0 + c2 w^2 + c3 w^3 (Fp2 coeffs) — the
    M-twist line shape evaluated on the twist (see ops/pairing.py). Batched:
    18 coefficient products as one fp2 mul."""
    slots = np.array([0, 2, 3], dtype=np.int32)
    # build (18,) routing: f_i * c_k -> slot (i + k) mod 6, wrap if >= 6
    fi = np.repeat(np.arange(6), 3)
    ck = np.tile(slots, 6)
    out_slot = (fi + ck) % 6
    wrap = ((fi + ck) >= 6).astype(np.uint32)
    route_plain = np.zeros((18, 6), dtype=np.int32)
    route_wrap = np.zeros((18, 6), dtype=np.int32)
    for t in range(18):
        (route_wrap if wrap[t] else route_plain)[t, out_slot[t]] = 1

    line = jnp.stack([c0, c2, c3], axis=-3)  # (..., 3, 2, L)
    f_sel = f[..., jnp.asarray(fi), :, :]  # (..., 18, 2, L)
    l_sel = line[..., jnp.asarray(np.arange(18) % 3), :, :]
    prods = fp2_mul(f_sel, l_sel)
    p0, p1 = prods[..., 0, :], prods[..., 1, :]
    xi_p = jnp.stack([fp.sub(p0, p1), fp.add(p0, p1)], axis=-2)
    plain = _route_sum(prods, route_plain)
    wrapv = _route_sum(xi_p, route_wrap)
    return _reduce_lazy_fp(plain + wrapv)


def fp12_conj(a):
    """f^(p^6): negate odd w-power coefficients (w -> -w is the nontrivial
    automorphism over Fp6... here: gamma6 = xi^((p^6-1)/6) = -1)."""
    signs = jnp.asarray([1, 0, 1, 0, 1, 0], dtype=jnp.uint32)  # 1 = keep

    neg = fp2_neg(a)
    return jnp.where(signs[:, None, None].astype(bool), a, neg)


def fp12_inv(a):
    """Inverse via the norm tower: for f = g + h w^3 viewing Fp12 as a
    quadratic extension over the w^3 axis? Simpler: adjugate through the
    conjugation orbit: 1/f = prod_{k=1..5} frob^k(f)... too many muls.
    Use quadratic split over Fp6': f = A + B w with A = (a0, a2, a4) on even
    powers (an Fp6 = Fp2[w^2]/((w^2)^3 - xi) element) and B = (a1, a3, a5):
    f^-1 = (A - Bw) / (A^2 - B^2 w^2), where w^2 = v generates the cubic
    subextension. The denominator lives in the even subalgebra (Fp6)."""
    A = a[..., 0::2, :, :]  # coeffs of v^0, v^1, v^2 (v = w^2)
    B = a[..., 1::2, :, :]
    A2 = _fp6_sqr(A)
    B2 = _fp6_sqr(B)
    # (Bw)^2 = B^2 w^2 = B^2 * v: multiply-by-v in the cubic algebra
    B2v = _fp6_mul_by_v(B2)
    D = _fp6_sub(A2, B2v)
    Dinv = _fp6_inv(D)
    c_even = _fp6_mul(A, Dinv)
    c_odd = _fp6_mul(B, Dinv)
    out = fp12_zero(a.shape[:-3])
    out = out.at[..., 0::2, :, :].set(c_even)
    out = out.at[..., 1::2, :, :].set(fp2_neg(c_odd))
    return out


# --- Fp6 helpers on (..., 3, 2, L) over v, v^3 = xi -------------------------

def _fp6_add(a, b):
    return fp2_add(a, b)


def _fp6_sub(a, b):
    return fp2_sub(a, b)


def _fp6_mul_by_v(a):
    """(a0, a1, a2) -> (xi*a2, a0, a1)."""
    a2 = a[..., 2, :, :]
    xi_a2 = jnp.stack(
        [fp.sub(a2[..., 0, :], a2[..., 1, :]), fp.add(a2[..., 0, :], a2[..., 1, :])],
        axis=-2,
    )
    return jnp.stack([xi_a2, a[..., 0, :, :], a[..., 1, :, :]], axis=-3)


_IDX3_I, _IDX3_J = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
_IDX3_I = _IDX3_I.reshape(-1)
_IDX3_J = _IDX3_J.reshape(-1)
_ROUTE3_PLAIN = np.zeros((9, 3), dtype=np.int32)
_ROUTE3_WRAP = np.zeros((9, 3), dtype=np.int32)
for _t in range(9):
    s = (_IDX3_I[_t] + _IDX3_J[_t]) % 3
    if _IDX3_I[_t] + _IDX3_J[_t] >= 3:
        _ROUTE3_WRAP[_t, s] = 1
    else:
        _ROUTE3_PLAIN[_t, s] = 1


def _fp6_mul(a, b):
    """Cubic extension product over v (v^3 = xi): 9 coefficient products as
    one batched fp2 mul, routed lazy sums, single reduction — same
    compile-size discipline as fp12_mul."""
    ai = a[..., jnp.asarray(_IDX3_I), :, :]
    bj = b[..., jnp.asarray(_IDX3_J), :, :]
    prods = fp2_mul(ai, bj)
    p0, p1 = prods[..., 0, :], prods[..., 1, :]
    xi_p = jnp.stack([fp.sub(p0, p1), fp.add(p0, p1)], axis=-2)
    lazy = _route_sum(prods, _ROUTE3_PLAIN) + _route_sum(xi_p, _ROUTE3_WRAP)
    return _reduce_lazy_fp(lazy)


def _fp6_sqr(a):
    return _fp6_mul(a, a)


def _xi(a):
    return jnp.stack(
        [fp.sub(a[..., 0, :], a[..., 1, :]), fp.add(a[..., 0, :], a[..., 1, :])],
        axis=-2,
    )


def _fp6_inv(a):
    a0, a1, a2 = (a[..., i, :, :] for i in range(3))
    # first product wave (batched): a0^2, a1*a2, a2^2, a0*a1, a1^2, a0*a2
    lhs = jnp.stack([a0, a1, a2, a0, a1, a0], axis=-3)
    rhs = jnp.stack([a0, a2, a2, a1, a1, a2], axis=-3)
    pr = fp2_mul(lhs, rhs)
    c0 = fp2_sub(pr[..., 0, :, :], _xi(pr[..., 1, :, :]))
    c1 = fp2_sub(_xi(pr[..., 2, :, :]), pr[..., 3, :, :])
    c2 = fp2_sub(pr[..., 4, :, :], pr[..., 5, :, :])
    # t = a0 c0 + xi (a2 c1 + a1 c2), batched
    lhs2 = jnp.stack([a0, a2, a1], axis=-3)
    rhs2 = jnp.stack([c0, c1, c2], axis=-3)
    pr2 = fp2_mul(lhs2, rhs2)
    t = fp2_add(pr2[..., 0, :, :], _xi(fp2_add(pr2[..., 1, :, :], pr2[..., 2, :, :])))
    tinv = fp2_inv(t)
    cs = jnp.stack([c0, c1, c2], axis=-3)
    return fp2_mul(cs, tinv[..., None, :, :])


# ---------------------------------------------------------------------------
# Frobenius (host-precomputed gamma constants)
# ---------------------------------------------------------------------------

def _host_gammas():
    """gamma_k[i] = xi^(i*(p^k - 1)/6) in Fp2 for k = 1, 2, 3."""
    from ..refimpl.curve import fp2_pow
    from ..refimpl.field import P

    from ..refimpl.curve import fp2_mul as h_fp2_mul

    xi = (1, 1)
    # sanity: gamma6 = xi^((p^6-1)/6) must be -1 (backs fp12_conj)
    assert fp2_pow(xi, (P**6 - 1) // 6) == (P - 1, 0)
    out = {}
    for k in (1, 2, 3):
        e = (P**k - 1) // 6
        base = fp2_pow(xi, e)
        gam = [(1, 0)]
        for _ in range(5):
            gam.append(h_fp2_mul(gam[-1], base))
        out[k] = np.stack([fp2_host_to_mont(g) for g in gam])  # (6, 2, L)
    return out


_GAMMAS = _host_gammas()


def fp12_frobenius(a, k: int):
    """f^(p^k) for k in {1, 2, 3}: conjugate coefficients (odd k), scale by
    gamma_k^i — one batched fp2 mul over the 6 coefficients."""
    if k % 2 == 1:
        coeffs = fp2_conj(a)  # componentwise over the stacked axis
    else:
        coeffs = a
    return fp2_mul(coeffs, jnp.asarray(_GAMMAS[k]))


def fp12_eq(a, b):
    return jnp.all(a == b, axis=(-1, -2, -3))


def fp12_select(cond, a, b):
    return jnp.where(cond[..., None, None, None], a, b)


# host conversion helpers --------------------------------------------------

def fp12_host_to_mont(coeffs6) -> np.ndarray:
    """Host: list of 6 (c0, c1) int pairs -> (6, 2, L)."""
    return np.stack([fp2_host_to_mont(c) for c in coeffs6])
