"""Pairing spec tests: bilinearity, non-degeneracy, and the KZG opening
identity e(C - y*G1, G2) == e(W, (tau - z)*G2) that underpins both multi-open
flavors (verification_halo2_kzg.hbs:211-216 pairing check)."""

import pytest

from plutus_halo2_tpu.refimpl.field import Q, fr_inv
from plutus_halo2_tpu.refimpl import curve as cv
from plutus_halo2_tpu.refimpl import pairing as pr


def test_fp12_arith_basics():
    a = tuple(range(1, 13))
    b = tuple(range(3, 15))
    assert pr.fp12_mul(a, pr.FP12_ONE) == tuple(x % pr.P for x in a)
    ab = pr.fp12_mul(a, b)
    ba = pr.fp12_mul(b, a)
    assert ab == ba
    inv = pr.fp12_inv(a)
    assert pr.fp12_mul(a, inv) == pr.FP12_ONE


def test_fp2_embedding_homomorphism():
    x = (123456789, 987654321)
    y = (31337, 271828)
    lhs = pr.fp2_to_fp12(cv.fp2_mul(x, y))
    rhs = pr.fp12_mul(pr.fp2_to_fp12(x), pr.fp2_to_fp12(y))
    assert lhs == rhs


@pytest.mark.slow
def test_pairing_bilinearity():
    g1 = cv.G1_GEN
    g2 = cv.G2_GEN
    a, b = 5, 11
    e_ab = pr.final_exponentiation(pr.miller_loop(cv.g1_mul(g1, a), cv.g2_mul(g2, b)))
    e_1 = pr.final_exponentiation(pr.miller_loop(g1, g2))
    assert e_ab == pr.fp12_pow(e_1, a * b)
    assert e_1 != pr.FP12_ONE  # non-degeneracy


@pytest.mark.slow
def test_kzg_opening_identity():
    # trapdoor SRS: tau known, commit(p) = p(tau) * G1
    tau = 0xDEADBEEF12345678
    # p(X) = 3X^2 + 2X + 7, opened at z=5: y = p(5) = 92
    p = lambda x: (3 * x * x + 2 * x + 7) % Q
    z, y = 5, p(5)
    commitment = cv.g1_mul(cv.G1_GEN, p(tau))
    # witness w(X) = (p(X)-y)/(X-z); w(tau) computed via field division
    w_tau = (p(tau) - y) * fr_inv(tau - z) % Q
    witness = cv.g1_mul(cv.G1_GEN, w_tau)
    s_g2 = cv.g2_mul(cv.G2_GEN, tau)
    # e(W, s_g2) == e(W*z + C - y*G1, G2)  (the verifier's el/er arrangement)
    el = witness
    er = cv.g1_add(
        cv.g1_add(cv.g1_mul(el, z), commitment),
        cv.g1_neg(cv.g1_mul(cv.G1_GEN, y)),
    )
    ml_l = pr.miller_loop(el, s_g2)
    ml_r = pr.miller_loop(er, cv.G2_GEN)
    assert pr.final_verify(ml_l, ml_r)
    # reject a wrong claimed evaluation
    er_bad = cv.g1_add(er, cv.G1_GEN)
    assert not pr.final_verify(ml_l, pr.miller_loop(er_bad, cv.G2_GEN))
