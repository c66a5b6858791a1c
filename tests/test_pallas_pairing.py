"""Kernel-layout Fp12 tower (ops/pallas_pairing) vs ops/tower.py: bit-exact
component checks under plain jit (the component functions are pure jnp; the
full pallas kernel itself is exercised on real TPU by tools/perf_probe.py and
bench.py — whole-pairing interpret mode is impractically slow on CPU)."""

import random
from functools import partial

import jax
import numpy as np
import pytest

from plutus_halo2_tpu.ops import pallas_pairing as kp
from plutus_halo2_tpu.ops import tower as xt
from plutus_halo2_tpu.ops.pallas_core import FP24_SPEC, host_reencode24
from plutus_halo2_tpu.ops.pallas_core import kfp
from plutus_halo2_tpu.refimpl.field import P

B = 2


def _rand_fp12(rng):
    return [
        (rng.randrange(P), rng.randrange(P)) for _ in range(6)
    ]


def _to_kernel(coeffs6):
    """host fp12 -> (6, 2, L24, B) in the kernel's 24-limb R24 domain."""
    arr = host_reencode24(xt.fp12_host_to_mont(coeffs6))  # (6, 2, L24)
    return np.broadcast_to(arr[..., None], (*arr.shape, B)).copy()


def _to_xla(coeffs6):
    """host fp12 -> (B, 6, 2, L)."""
    arr = xt.fp12_host_to_mont(coeffs6)
    return np.broadcast_to(arr[None], (B, *arr.shape)).copy()


def _from_kernel(a):
    """(6, 2, L24, B) -> host list for lane 0 (R24 domain)."""
    a = np.asarray(a)[..., 0]
    return [
        (FP24_SPEC.from_mont_int(a[i][0]), FP24_SPEC.from_mont_int(a[i][1]))
        for i in range(6)
    ]


def _from_xla(a):
    a = np.asarray(a)[0]
    return [xt.fp2_host_from_mont(a[i]) for i in range(6)]


@pytest.fixture(scope="module")
def rng():
    return random.Random(31)


def test_k12_mul_sqr(rng):
    a, b = _rand_fp12(rng), _rand_fp12(rng)
    got = _from_kernel(jax.jit(partial(kp.k12_mul, kfp))(_to_kernel(a), _to_kernel(b)))
    exp = _from_xla(jax.jit(xt.fp12_mul)(_to_xla(a), _to_xla(b)))
    assert got == exp
    got2 = _from_kernel(jax.jit(partial(kp.k12_sqr, kfp))(_to_kernel(a)))
    exp2 = _from_xla(jax.jit(xt.fp12_sqr)(_to_xla(a)))
    assert got2 == exp2


def test_k12_sparse023(rng):
    f = _rand_fp12(rng)
    c0, c2, c3 = [(rng.randrange(P), rng.randrange(P)) for _ in range(3)]

    def to_k2(c):
        arr = host_reencode24(xt.fp2_host_to_mont(c))
        return np.broadcast_to(arr[..., None], (*arr.shape, B)).copy()

    def to_x2(c):
        arr = xt.fp2_host_to_mont(c)
        return np.broadcast_to(arr[None], (B, *arr.shape)).copy()

    got = _from_kernel(
        jax.jit(partial(kp.k12_mul_sparse023, kfp))(
            _to_kernel(f), to_k2(c0), to_k2(c2), to_k2(c3)
        )
    )
    exp = _from_xla(
        jax.jit(xt.fp12_mul_sparse023)(_to_xla(f), to_x2(c0), to_x2(c2), to_x2(c3))
    )
    assert got == exp


def test_k12_conj_frobenius(rng):
    a = _rand_fp12(rng)
    got = _from_kernel(jax.jit(partial(kp.k12_conj, kfp))(_to_kernel(a)))
    exp = _from_xla(jax.jit(xt.fp12_conj)(_to_xla(a)))
    assert got == exp

    for k in (1, 2):
        gam = host_reencode24(xt._GAMMAS[k])[..., None]  # (6, 2, L24, 1)
        got = _from_kernel(
            jax.jit(partial(kp.k12_frobenius, kfp, odd=bool(k % 2)))(
                _to_kernel(a), gam_k=gam
            )
        )
        exp = _from_xla(jax.jit(partial(xt.fp12_frobenius, k=k))(_to_xla(a)))
        assert got == exp, f"frobenius k={k}"


def test_k12_inv(rng):
    a = _rand_fp12(rng)
    fpinv = lambda v: kfp.pow_static(v, P - 2)  # noqa: E731
    inv = jax.jit(lambda x: kp.k12_inv(kfp, x, fpinv))(_to_kernel(a))
    prod = jax.jit(partial(kp.k12_mul, kfp))(_to_kernel(a), inv)
    one = np.asarray(jax.jit(lambda: kp.k12_one(kfp, B))())
    # canon: lazy-domain coefficients are compared by value, not representative
    assert (np.asarray(jax.jit(kfp.canon)(prod)) == one).all()


def test_k12_cyclotomic_sqr(rng):
    """Granger-Scott squaring agrees with the generic squaring on elements of
    the cyclotomic subgroup (constructed via the easy part f^((p^6-1)(p^2+1))
    using the independently tested XLA tower)."""
    f = _rand_fp12(rng)
    fx = _to_xla(f)
    t = xt.fp12_mul(xt.fp12_conj(fx), xt.fp12_inv(fx))
    from plutus_halo2_tpu.ops.pallas_core import fp24_from_fp25

    m = np.asarray(
        jax.jit(lambda t: fp24_from_fp25(xt.fp12_mul(xt.fp12_frobenius(t, 2), t)))(t)
    )
    mk = np.moveaxis(m, 0, -1)  # kernel layout (6, 2, L24, B)
    got = np.asarray(jax.jit(lambda x: kfp.canon(kp.k12_cyc_sqr(kfp, x)))(mk))
    exp = np.asarray(jax.jit(lambda x: kfp.canon(kp.k12_sqr(kfp, x)))(mk))
    assert (got == exp).all()


def test_pow_win_loop(rng):
    """Windowed static-exponent ladder vs pow_static, incl. the p-2 schedule."""
    import jax.numpy as jnp

    for e in (5, 1 << 16, P - 2):
        digs = jnp.asarray(kp.window_digits(e))
        x = rng.randrange(1, P)
        xk = np.broadcast_to(
            FP24_SPEC.to_mont(x)[:, None], (FP24_SPEC.L, B)
        ).copy()
        got = np.asarray(jax.jit(lambda a: kp.pow_win_loop(kfp, a, digs))(xk))
        assert FP24_SPEC.from_mont_int(got[:, 0]) == pow(x, e, P), f"exp {e}"
