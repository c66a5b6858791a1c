"""Pallas TPU kernel for the batched BLS12-381 pairing check.

One pallas_call runs the whole check e(P1,Q1)*e(P2,Q2) == 1 for a batch of
128 proofs per grid step: projective->affine conversion (Fermat inversion),
the Miller loop over host-prepared G2 line ladders (ops/pairing.prepare_g2),
and the final exponentiation — all as fori_loop Mosaic code with no per-op
XLA dispatch. Replaces ops/pairing.pairing_check on the hot path.

Math and constants are identical to ops/pairing.py + ops/tower.py (same
Montgomery FieldSpec, same verified hard-part chain 3h = (x-1)^2 (x+p)
(x^2+p^2-1) + 3), so results are bit-exact vs those tested modules.

Layout (see ops/pallas_core): Fp = (..., L, B), Fp2 = (..., 2, L, B),
Fp12 = (6, 2, L, B) with w^0..w^5 coefficients of the sextic-over-quadratic
tower, xi = u + 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..refimpl.field import BLS_X, P
from .limb import FP_SPEC
from .pallas_core import kfp, staged_broadcast, _carry_once
from . import tower as xtower

LANES = 128
_BITS = bin(BLS_X)[3:]  # 63 Miller steps, MSB skipped
L = FP_SPEC.L


# ---------------------------------------------------------------------------
# Fp2 helpers on (..., 2, L, B), generic over a bound KField
# ---------------------------------------------------------------------------

def k2_add(F, a, b):
    return jnp.stack(
        [F.add(a[..., 0, :, :], b[..., 0, :, :]), F.add(a[..., 1, :, :], b[..., 1, :, :])],
        axis=-3,
    )


def k2_sub(F, a, b):
    return jnp.stack(
        [F.sub(a[..., 0, :, :], b[..., 0, :, :]), F.sub(a[..., 1, :, :], b[..., 1, :, :])],
        axis=-3,
    )


def k2_neg(F, a):
    return jnp.stack([F.neg(a[..., 0, :, :]), F.neg(a[..., 1, :, :])], axis=-3)


def k2_conj(F, a):
    return jnp.stack([a[..., 0, :, :], F.neg(a[..., 1, :, :])], axis=-3)


def k2_mul(F, a, b):
    """Karatsuba: 3 Fp muls."""
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    b0, b1 = b[..., 0, :, :], b[..., 1, :, :]
    m0 = F.mont_mul(a0, b0)
    m1 = F.mont_mul(a1, b1)
    m2 = F.mont_mul(F.add(a0, a1), F.add(b0, b1))
    return jnp.stack([F.sub(m0, m1), F.sub(m2, F.add(m0, m1))], axis=-3)


def k2_mul_fp(F, a, s):
    return jnp.stack(
        [F.mont_mul(a[..., 0, :, :], s), F.mont_mul(a[..., 1, :, :], s)], axis=-3
    )


def k2_xi(F, a):
    """(u+1) * a."""
    return jnp.stack(
        [
            F.sub(a[..., 0, :, :], a[..., 1, :, :]),
            F.add(a[..., 0, :, :], a[..., 1, :, :]),
        ],
        axis=-3,
    )


def fp_inv_ladder(F, a, pm2bits_ref):
    """Fermat inversion a^(p-2) as a 380-step fori ladder; exponent bits come
    from SMEM (shape (1, NB) int32, MSB first, leading 1 dropped)."""
    nb = pm2bits_ref.shape[-1]

    def body(i, acc):
        acc = F.sqr(acc)
        with_a = F.mont_mul(acc, a)
        return jnp.where(pm2bits_ref[0, i] != 0, with_a, acc)

    return jax.lax.fori_loop(0, nb, body, a)


def k2_inv(F, a, fpinv):
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    norm = F.add(F.mont_mul(a0, a0), F.mont_mul(a1, a1))
    ninv = fpinv(norm)
    return jnp.stack(
        [F.mont_mul(a0, ninv), F.neg(F.mont_mul(a1, ninv))], axis=-3
    )


# ---------------------------------------------------------------------------
# Fp12 on (6, 2, L, B)
# ---------------------------------------------------------------------------

_IDX_I = np.repeat(np.arange(6), 6)
_IDX_J = np.tile(np.arange(6), 6)
_OUT = (_IDX_I + _IDX_J) % 6
_WRAP = (_IDX_I + _IDX_J) >= 6


def k12_zero(F, lanes):
    return jnp.zeros((6, 2, F.L, lanes), dtype=jnp.uint32)


def k12_one(F, lanes):
    one = F.one((lanes,))
    zero = F.zeros((lanes,))
    c0 = jnp.stack([one, zero], axis=0)  # (2, L, B)
    rest = jnp.zeros((5, 2, F.L, lanes), dtype=jnp.uint32)
    return jnp.concatenate([c0[None], rest], axis=0)


def _reduce_lazy(F, x):
    """One Montgomery pass with b = R mod N after two carry folds."""
    x = _carry_once(_carry_once(x))
    return F.mont_mul(x, F._row("one_mont"))


def _route(F, prods, xi_p, out_slots, wraps, n_slots=6):
    """prods, xi_p: (T, 2, L, B) canonical fp2 values; lazily sum into slots
    (raw limb adds, <= 6 terms each) and reduce once."""
    slots = []
    for s in range(n_slots):
        terms = [
            (xi_p if wraps[t] else prods)[t]
            for t in range(len(out_slots))
            if out_slots[t] == s
        ]
        acc = terms[0]
        for x in terms[1:]:
            acc = acc + x  # raw limb sums, < 6 * 2^16 per column
        slots.append(acc)
    return _reduce_lazy(F, jnp.stack(slots, axis=0))


def k12_mul(F, a, b):
    # index-free coefficient pairing (gathers would capture index constants,
    # which pallas kernels reject): repeat <-> tile
    ai = jnp.repeat(a, 6, axis=0)  # (36, 2, L, B): a[i] at slot 6i+j
    bj = jnp.concatenate([b] * 6, axis=0)  # b[j] at slot 6i+j
    prods = k2_mul(F, ai, bj)
    xi_p = k2_xi(F, prods)
    return _route(F, prods, xi_p, _OUT, _WRAP)


def k12_sqr(F, a):
    return k12_mul(F, a, a)


_SP_FI = np.repeat(np.arange(6), 3)
_SP_CK = np.tile(np.array([0, 2, 3]), 6)
_SP_OUT = (_SP_FI + _SP_CK) % 6
_SP_WRAP = (_SP_FI + _SP_CK) >= 6
_SP_LSEL = np.arange(18) % 3


def k12_mul_sparse023(F, f, c0, c2, c3):
    """f * (c0 + c2 w^2 + c3 w^3), the M-twist line shape."""
    line = jnp.stack([c0, c2, c3], axis=0)  # (3, 2, L, B)
    f_sel = jnp.repeat(f, 3, axis=0)  # (18, ...): f[i] at slot 3i+k
    l_sel = jnp.concatenate([line] * 6, axis=0)  # line[k] at slot 3i+k
    prods = k2_mul(F, f_sel, l_sel)
    xi_p = k2_xi(F, prods)
    return _route(F, prods, xi_p, _SP_OUT, _SP_WRAP)


def k12_conj(F, a):
    neg = k2_neg(F, a)
    # keep even w-powers: full-shape iota avoids multi-axis mask broadcasts
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    return jnp.where(idx % 2 == 0, a, neg)


def k12_frobenius(F, a, gam_k, odd: bool):
    """a^(p^k)-style coefficient transform: conjugate coefficients for odd k,
    then scale coefficient i by gamma_k^i (gam_k: (6, 2, L, B-or-1))."""
    coeffs = k2_conj(F, a) if odd else a
    return k2_mul(F, coeffs, gam_k)


# Fp6 on (3, 2, L, B) over v, v^3 = xi — for the inverse tower
_I3 = np.repeat(np.arange(3), 3)
_J3 = np.tile(np.arange(3), 3)
_OUT3 = (_I3 + _J3) % 3
_WRAP3 = (_I3 + _J3) >= 3


def k6_mul(F, a, b):
    prods = k2_mul(
        F, jnp.repeat(a, 3, axis=0), jnp.concatenate([b] * 3, axis=0)
    )
    return _route(F, prods, k2_xi(F, prods), _OUT3, _WRAP3, n_slots=3)


def k6_mul_by_v(F, a):
    return jnp.concatenate([k2_xi(F, a[2:3]), a[0:1], a[1:2]], axis=0)


def k6_inv(F, a, fpinv):
    a0, a1, a2 = a[0], a[1], a[2]
    lhs = jnp.stack([a0, a1, a2, a0, a1, a0], axis=0)
    rhs = jnp.stack([a0, a2, a2, a1, a1, a2], axis=0)
    pr = k2_mul(F, lhs, rhs)
    c0 = k2_sub(F, pr[0], k2_xi(F, pr[1]))
    c1 = k2_sub(F, k2_xi(F, pr[2]), pr[3])
    c2 = k2_sub(F, pr[4], pr[5])
    pr2 = k2_mul(F, jnp.stack([a0, a2, a1], axis=0), jnp.stack([c0, c1, c2], axis=0))
    t = k2_add(F, pr2[0], k2_xi(F, k2_add(F, pr2[1], pr2[2])))
    tinv = k2_inv(F, t, fpinv)
    return k2_mul(F, jnp.stack([c0, c1, c2], axis=0), tinv[None])


def k12_inv(F, a, fpinv):
    pairs = a.reshape(3, 2, *a.shape[1:])  # (3, even/odd, 2, L, B)
    A = pairs[:, 0]  # even w-powers (the Fp6 subalgebra over v = w^2)
    B_ = pairs[:, 1]
    D = k2_sub(F, k6_mul(F, A, A), k6_mul_by_v(F, k6_mul(F, B_, B_)))
    Dinv = k6_inv(F, D, fpinv)
    c_even = k6_mul(F, A, Dinv)
    c_odd = k2_neg(F, k6_mul(F, B_, Dinv))
    inter = jnp.stack([c_even, c_odd], axis=1)  # (3, 2, 2, L, B)
    return inter.reshape(6, *a.shape[1:])


# ---------------------------------------------------------------------------
# the pairing-check kernel
# ---------------------------------------------------------------------------

def _pack_prep(prep) -> tuple[np.ndarray, np.ndarray]:
    """ops/pairing.prepare_g2 dict -> (lines (63, 4, 2, L), mask (63,))."""
    lines = np.stack(
        [prep["dbl_lam"], prep["dbl_c"], prep["add_lam"], prep["add_c"]], axis=1
    )
    return lines.astype(np.uint32), prep["add_mask"].astype(np.int32)


def make_pairing_check(prep1, prep2, lanes: int = LANES, interpret: bool = False):
    """Build check(el (B,3,L), er (B,3,L)) -> (B,) bool computing
    e(el, Q1) * e(er, Q2) == 1 with host-prepared Q ladders (projective
    Montgomery inputs; affine conversion happens in-kernel)."""
    lines1, mask1 = _pack_prep(prep1)
    lines2, mask2 = _pack_prep(prep2)
    lines = np.stack([lines1, lines2])  # (2, 63, 4, 2, L)
    masks = np.stack([mask1, mask2])  # (2, 63)
    xbits = np.array([[int(c) for c in _BITS]], dtype=np.int32)  # (1, 63)
    pm2bits = np.array([[int(c) for c in bin(P - 2)[3:]]], dtype=np.int32)
    gammas = np.stack([xtower._GAMMAS[k] for k in (1, 2, 3)])  # (3, 6, 2, L)

    def kernel(consts_ref, gam_ref, lines_ref, masks_ref, xbits_ref, pm2_ref,
               points_ref, out_ref):
        F = kfp.bind(consts_ref[:, :])
        fpinv = lambda v: fp_inv_ladder(F, v, pm2_ref)  # noqa: E731
        gam = gam_ref[:, :, :, :][..., None]  # (3, 6, 2, L, 1)

        # --- projective -> affine (one batched Fermat chain for both points)
        pts = points_ref[:, :, :, :]  # (2, 3, L, B)
        Z = pts[:, 2]
        zi = fpinv(Z)  # (2, L, B)
        xa = F.mont_mul(pts[:, 0], zi)
        ya = F.mont_mul(pts[:, 1], zi)
        inf_mask = F.is_zero(Z)  # (2, B)

        one2 = jnp.stack([F.one((lanes,)), F.zeros((lanes,))], axis=0)  # (2, L, B)
        zero2 = jnp.zeros_like(one2)

        def line_mul(f, j, i, kind):
            """Multiply f by the `kind` line of pair j at Miller step i."""
            base = 0 if kind == "dbl" else 2
            lam = lines_ref[j, pl.ds(i, 1), base][0][..., None]  # (2, L, 1)
            cc = lines_ref[j, pl.ds(i, 1), base + 1][0][..., None]
            isinf = inf_mask[j][None, None, :]  # (1, 1, B)
            c2 = k2_mul_fp(F, lam, xa[j])  # (2, L, B)
            c3 = jnp.stack([F.neg(ya[j]), F.zeros((lanes,))], axis=0)
            c0 = staged_broadcast(cc, c3.shape).astype(jnp.uint32)
            if kind == "add":
                # inactive steps use the lam=0, c=1 dummies from prepare_g2,
                # but c3 (-yp) must be masked off to make the line == 1
                active = masks_ref[j, i] != 0
                c3 = jnp.where(active, c3, zero2)
            # identity G1 point contributes the factor 1
            c0 = jnp.where(isinf, one2, c0)
            c2 = jnp.where(isinf, zero2, c2)
            c3 = jnp.where(isinf, zero2, c3)
            return k12_mul_sparse023(F, f, c0, c2, c3)

        def miller_body(i, f):
            f = k12_sqr(F, f)
            for j in range(2):
                f = line_mul(f, j, i, "dbl")
                f = line_mul(f, j, i, "add")
            return f

        f = jax.lax.fori_loop(0, 63, miller_body, k12_one(F, lanes))

        # --- final exponentiation -------------------------------------------
        def exp_by_neg_x(m):
            def body(i, acc):
                acc = k12_sqr(F, acc)
                with_m = k12_mul(F, acc, m)
                return jnp.where(xbits_ref[0, i] != 0, with_m, acc)

            acc = jax.lax.fori_loop(0, 63, body, m)
            return k12_conj(F, acc)  # negative x: cyclotomic inverse

        t = k12_mul(F, k12_conj(F, f), k12_inv(F, f, fpinv))
        m = k12_mul(F, k12_frobenius(F, t, gam[1], odd=False), t)
        a = k12_mul(F, exp_by_neg_x(m), k12_conj(F, m))
        b = k12_mul(F, exp_by_neg_x(a), k12_conj(F, a))
        c_ = k12_mul(F, exp_by_neg_x(b), k12_frobenius(F, b, gam[0], odd=True))
        d = exp_by_neg_x(exp_by_neg_x(c_))
        e = k12_mul(
            F, k12_mul(F, d, k12_frobenius(F, c_, gam[1], odd=False)), k12_conj(F, c_)
        )
        out = k12_mul(F, e, k12_mul(F, k12_sqr(F, m), m))

        diff = jnp.sum(
            (out != k12_one(F, lanes)).astype(jnp.int32), axis=(0, 1, 2)
        )  # (B,)
        out_ref[:, :] = (diff == 0)[None, :].astype(jnp.uint32)

    def check(el, er):
        B = el.shape[0]
        assert B % lanes == 0, f"batch {B} must be a multiple of {lanes}"
        nbt = B // lanes
        pts = jnp.stack([jnp.moveaxis(el, 0, -1), jnp.moveaxis(er, 0, -1)])

        ok = pl.pallas_call(
            kernel,
            grid=(nbt,),
            in_specs=[
                pl.BlockSpec((4, L + 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 6, 2, L), lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 63, 4, 2, L), lambda b: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 3, L, lanes), lambda b: (0, 0, 0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, lanes), lambda b: (0, b), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.uint32),
            # peak live state (f + k12_mul temporaries + line ladder) is ~17MB
            # at 128 lanes, just over the default 16MB scoped-vmem limit
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(kfp.const_args(), gammas, lines, masks, xbits, pm2bits, pts)
        return ok[0].astype(bool)

    return check
