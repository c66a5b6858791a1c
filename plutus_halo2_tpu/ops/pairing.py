"""Batched BLS12-381 pairing checks for TPU (JAX).

Kernel replacement for the `bls12_381_millerLoop` / `bls12_381_finalVerify`
builtins in the generated verifiers (verification_halo2_kzg.hbs:211-216).

Key structural choice: in Halo2/KZG verification the G2 arguments (s_g2 and
the G2 generator) are fixed per verifying key, so the entire G2 side of the
Miller loop — the doubling/addition ladder and its line slopes — is
precomputed on the host with exact big-int arithmetic ("prepared pairing").
The device only evaluates, per batch element, the sparse line values at its
G1 points and accumulates f = f^2 * l ... inside a single lax.scan.

Lines on the M-twist evaluated at psi^{-1}(P) = (xp*w^2, yp*w^3):
    l = (y' - lambda' x')  +  (lambda' xp) w^2  -  yp w^3
i.e. sparse Fp12 coefficients at w^0, w^2, w^3 (see ops/tower.fp12_mul_sparse023).

Final exponentiation uses the numerically verified identity
    3*(p^4 - p^2 + 1)/q == (x-1)^2 (x+p) (x^2 + p^2 - 1) + 3
(checked at import); exponentiating by 3h instead of h is sound because
mu_q contains no cube roots of unity (gcd(3, q) = 1)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..refimpl.curve import fp2_add as h_add
from ..refimpl.curve import fp2_inv as h_inv
from ..refimpl.curve import fp2_mul as h_mul
from ..refimpl.curve import fp2_scalar as h_scalar
from ..refimpl.curve import fp2_sub as h_sub
from ..refimpl.field import BLS_X, P, Q
from . import tower
from .limb import FP_SPEC, fp
from .tower import (
    fp12_conj,
    fp12_frobenius,
    fp12_inv,
    fp12_mul,
    fp12_mul_sparse023,
    fp12_one,
    fp12_sqr,
    fp2_mul_fp,
)

# verified at import (backs the hard-part chain below)
assert (
    3 * ((P**4 - P**2 + 1) // Q)
    == ((-BLS_X) - 1) ** 2 * ((-BLS_X) + P) * (BLS_X**2 + P**2 - 1) + 3
)

_BITS = bin(BLS_X)[3:]  # Miller loop bit schedule (MSB skipped), 63 steps


# ---------------------------------------------------------------------------
# host-side preparation of a fixed G2 point
# ---------------------------------------------------------------------------

def prepare_g2(q_affine):
    """Precompute the Miller ladder line constants for a fixed G2 point
    (twist affine ((x0,x1),(y0,y1)) ints). Returns stacked device constants:
    dict of arrays with leading axis = 63 loop iterations."""
    xq, yq = q_affine
    t = (xq, yq)
    dbl_lam, dbl_c = [], []
    add_lam, add_c, add_mask = [], [], []
    one_fp2 = (1, 0)
    zero_fp2 = (0, 0)
    for bit in _BITS:
        x1, y1 = t
        lam = h_mul(h_scalar(h_mul(x1, x1), 3), h_inv(h_scalar(y1, 2)))
        c = h_sub(y1, h_mul(lam, x1))
        dbl_lam.append(lam)
        dbl_c.append(c)
        # affine double
        x3 = h_sub(h_mul(lam, lam), h_scalar(x1, 2))
        y3 = h_sub(h_mul(lam, h_sub(x1, x3)), y1)
        t = (x3, y3)
        if bit == "1":
            x1, y1 = t
            lam2 = h_mul(h_sub(yq, y1), h_inv(h_sub(xq, x1)))
            c2 = h_sub(y1, h_mul(lam2, x1))
            add_lam.append(lam2)
            add_c.append(c2)
            add_mask.append(1)
            x3 = h_sub(h_mul(lam2, lam2), h_add(x1, xq))
            y3 = h_sub(h_mul(lam2, h_sub(x1, x3)), y1)
            t = (x3, y3)
        else:
            add_lam.append(zero_fp2)
            add_c.append(one_fp2)  # dummy line multiplies by 1
            add_mask.append(0)
    return {
        "dbl_lam": np.stack([tower.fp2_host_to_mont(v) for v in dbl_lam]),
        "dbl_c": np.stack([tower.fp2_host_to_mont(v) for v in dbl_c]),
        "add_lam": np.stack([tower.fp2_host_to_mont(v) for v in add_lam]),
        "add_c": np.stack([tower.fp2_host_to_mont(v) for v in add_c]),
        "add_mask": np.asarray(add_mask, dtype=np.uint32),
    }


# ---------------------------------------------------------------------------
# device-side Miller loop over prepared pairs
# ---------------------------------------------------------------------------

def miller_prepared(pairs):
    """pairs: list of ((xp, yp, p_valid_mask_or_None), prep) where xp, yp are
    (...,L) Montgomery Fp coords of G1 points (projective callers must convert
    to affine first) and prep = prepare_g2 output. Computes
    prod_j f_{|x|,Qj}(Pj) without final exponentiation.

    G1 identity handling: a pair whose `inf` flag is True contributes 1
    (e(O, Q) = 1) — its line factors are replaced by one."""
    batch_shape = pairs[0][0][0].shape[:-1]

    consts = []
    for (_xp, _yp, _inf), prep in pairs:
        consts.append(
            (
                jnp.asarray(prep["dbl_lam"]),
                jnp.asarray(prep["dbl_c"]),
                jnp.asarray(prep["add_lam"]),
                jnp.asarray(prep["add_c"]),
                jnp.asarray(prep["add_mask"]),
            )
        )

    xs = tuple(consts)  # each leaf has leading axis 63

    def body(f, per_iter):
        f = fp12_sqr(f)
        for j, ((xp, yp, inf), _prep) in enumerate(pairs):
            dbl_lam, dbl_c, add_lam, add_c, add_mask = per_iter[j]
            neg_yp = fp.neg(yp)
            c3 = jnp.stack([neg_yp, fp.zeros(neg_yp.shape[:-1])], axis=-2)
            one2 = jnp.stack([fp.one(neg_yp.shape[:-1]), fp.zeros(neg_yp.shape[:-1])], axis=-2)
            zero2 = jnp.zeros_like(c3)

            # doubling line
            c2 = fp2_mul_fp(dbl_lam, xp)
            c0 = jnp.broadcast_to(dbl_c, c3.shape)
            if inf is not None:
                c0 = jnp.where(inf[..., None, None], one2, c0)
                c2 = jnp.where(inf[..., None, None], zero2, c2)
                c3d = jnp.where(inf[..., None, None], zero2, c3)
            else:
                c3d = c3
            f = fp12_mul_sparse023(f, c0, c2, c3d)

            # addition line (dummy iterations multiply by 1)
            active = add_mask.astype(bool)
            c2a = fp2_mul_fp(add_lam, xp)
            c3a = jnp.where(active, c3, zero2)
            c0a = jnp.broadcast_to(add_c, c3.shape)
            if inf is not None:
                c0a = jnp.where(inf[..., None, None], one2, c0a)
                c2a = jnp.where(inf[..., None, None], zero2, c2a)
                c3a = jnp.where(inf[..., None, None], zero2, c3a)
            f = fp12_mul_sparse023(f, c0a, c2a, c3a)
        return f, None

    f0 = fp12_one(batch_shape)
    f, _ = jax.lax.scan(body, f0, xs)
    return f


# ---------------------------------------------------------------------------
# final exponentiation
# ---------------------------------------------------------------------------

def _exp_by_neg_x(m):
    """m^x for the (negative) BLS parameter x: square-and-multiply by |x|,
    then conjugate (valid in the cyclotomic subgroup where m^-1 = conj(m))."""
    bits = jnp.asarray([int(b) for b in _BITS], dtype=jnp.uint32)

    def body(acc, bit):
        acc = fp12_sqr(acc)
        with_m = fp12_mul(acc, m)
        acc = tower.fp12_select(jnp.broadcast_to(bit.astype(bool), acc.shape[:-3]), with_m, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, m, bits)
    return fp12_conj(acc)


def final_exponentiation(f):
    """f^((p^12-1)/q * 3) — the cubed exponent keeps the == 1 test exact."""
    # easy part: t = f^(p^6 - 1); m = t^(p^2) * t
    t = fp12_mul(fp12_conj(f), fp12_inv(f))
    m = fp12_mul(fp12_frobenius(t, 2), t)
    # hard part (verified chain): m^(3h) with
    # 3h = (x-1)^2 (x+p) (x^2+p^2-1) + 3
    a = fp12_mul(_exp_by_neg_x(m), fp12_conj(m))  # m^(x-1)
    b = fp12_mul(_exp_by_neg_x(a), fp12_conj(a))  # m^((x-1)^2)
    c = fp12_mul(_exp_by_neg_x(b), fp12_frobenius(b, 1))  # ^(x+p)
    d = _exp_by_neg_x(_exp_by_neg_x(c))  # c^(x^2)
    e = fp12_mul(fp12_mul(d, fp12_frobenius(c, 2)), fp12_conj(c))  # ^(x^2+p^2-1)
    return fp12_mul(e, fp12_mul(fp12_sqr(m), m))  # * m^3


def pairing_check(pairs):
    """prod e(Pj, Qj) == 1 for prepared pairs; returns (...,) bool."""
    f = miller_prepared(pairs)
    out = final_exponentiation(f)
    return tower.fp12_eq(out, fp12_one(out.shape[:-3]))
