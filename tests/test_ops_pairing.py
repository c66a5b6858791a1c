"""Device pairing vs spec: tower arithmetic invariants and the KZG opening
identity pairing check (accept + reject) with prepared G2 ladders."""

import jax
import numpy as np
import pytest

from plutus_halo2_tpu.ops import pairing as jp
from plutus_halo2_tpu.ops import tower
from plutus_halo2_tpu.ops.limb import FP_SPEC
from plutus_halo2_tpu.ops import curve as jc
from plutus_halo2_tpu.refimpl import curve as rc
from plutus_halo2_tpu.refimpl.field import Q, fr_inv


def _fp12_rand(rng):
    return [(rng.randrange(FP_SPEC.N), rng.randrange(FP_SPEC.N)) for _ in range(6)]


def test_fp12_ring_axioms():
    import random

    rng = random.Random(11)
    a = np.stack([tower.fp12_host_to_mont(_fp12_rand(rng)) for _ in range(2)])
    b = np.stack([tower.fp12_host_to_mont(_fp12_rand(rng)) for _ in range(2)])

    mul = jax.jit(tower.fp12_mul)
    inv = jax.jit(tower.fp12_inv)
    one = np.asarray(tower.fp12_one((2,)))

    ab = mul(a, b)
    ba = mul(b, a)
    assert np.array_equal(np.asarray(ab), np.asarray(ba))
    assert np.array_equal(np.asarray(mul(a, one)), a)
    a_inv = inv(a)
    assert np.array_equal(np.asarray(mul(a, a_inv)), one)


def test_frobenius_is_pth_power():
    import random

    rng = random.Random(12)
    a = np.stack([tower.fp12_host_to_mont(_fp12_rand(rng))])
    frob = jax.jit(lambda x: tower.fp12_frobenius(x, 1))

    # a^p via p-th power ladder would be too slow; instead check
    # frob(x*y) == frob(x)*frob(y) and frob^6 == conj, frob^12 == id
    b = np.stack([tower.fp12_host_to_mont(_fp12_rand(rng))])
    mul = jax.jit(tower.fp12_mul)
    lhs = frob(mul(a, b))
    rhs = mul(frob(a), frob(b))
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs))

    x = a
    for _ in range(6):
        x = frob(x)
    assert np.array_equal(np.asarray(x), np.asarray(jax.jit(tower.fp12_conj)(a)))


@pytest.mark.slow
def test_kzg_pairing_check_device():
    """Same KZG opening identity as test_refimpl_pairing, evaluated by the
    batched device pairing: e(W, s_g2) * e(-(W*z + C - y*G1), G2) == 1."""
    tau = 0xDEADBEEF12345678
    poly = lambda t: (3 * t * t + 2 * t + 7) % Q
    z, y = 5, poly(5)
    commitment = rc.g1_mul(rc.G1_GEN, poly(tau))
    w_tau = (poly(tau) - y) * fr_inv(tau - z) % Q
    witness = rc.g1_mul(rc.G1_GEN, w_tau)
    s_g2 = rc.g2_mul(rc.G2_GEN, tau)

    el = witness
    er = rc.g1_add(
        rc.g1_add(rc.g1_mul(el, z), commitment),
        rc.g1_neg(rc.g1_mul(rc.G1_GEN, y)),
    )
    er_bad = rc.g1_add(er, rc.G1_GEN)

    prep_sg2 = jp.prepare_g2(s_g2)
    prep_g2 = jp.prepare_g2(rc.G2_GEN)

    def to_xy(p):
        return FP_SPEC.to_mont(p[0]), FP_SPEC.to_mont(p[1])

    # batch of 2: [valid, invalid]
    el_x = np.stack([to_xy(el)[0]] * 2)
    el_y = np.stack([to_xy(el)[1]] * 2)
    er_x = np.stack([to_xy(rc.g1_neg(er))[0], to_xy(rc.g1_neg(er_bad))[0]])
    er_y = np.stack([to_xy(rc.g1_neg(er))[1], to_xy(rc.g1_neg(er_bad))[1]])
    inf = np.zeros(2, dtype=bool)

    check = jax.jit(
        lambda ax, ay, bx, by, i: jp.pairing_check(
            [((ax, ay, i), prep_sg2), ((bx, by, i), prep_g2)]
        )
    )
    out = np.asarray(check(el_x, el_y, er_x, er_y, inf))
    assert out[0], "valid KZG opening must pass the device pairing check"
    assert not out[1], "tampered RHS must fail"
