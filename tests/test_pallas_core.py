"""Kernel-layout field ops (ops/pallas_core) vs the (..., L)-layout limb ops:
bit-exact equivalence on random vectors, plus a real pallas_call smoke in
interpret mode so the same code is exercised through the Pallas lowering."""

import random
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plutus_halo2_tpu.ops import limb
from plutus_halo2_tpu.ops.pallas_core import (
    FP24_SPEC,
    KField,
    fp24_from_fp25,
    fp25_from_fp24,
    from_kernel_layout,
    to_kernel_layout,
)


def _rand_batch(spec, B, rng, mont=True):
    vals = [rng.randrange(spec.N) for _ in range(B)]
    enc = spec.to_mont if mont else spec.encode
    return vals, np.stack([enc(v) for v in vals])


@pytest.mark.parametrize(
    "spec", [limb.FR_SPEC, limb.FP_SPEC, FP24_SPEC], ids=["fr", "fp", "fp24"]
)
def test_kernel_layout_ops_match_limb(spec):
    rng = random.Random(11)
    B = 16
    kf = KField(spec)
    vals_a, a = _rand_batch(spec, B, rng)
    vals_b, b = _rand_batch(spec, B, rng)
    ak = np.moveaxis(a, 0, -1)  # (L, B)
    bk = np.moveaxis(b, 0, -1)

    @jax.jit
    def run(ak, bk):
        return (
            kf.add(ak, bk),
            kf.sub(ak, bk),
            kf.neg(ak),
            kf.mont_mul(ak, bk),
            kf.pow_static(ak, 5, unroll=True),
        )

    add_o, sub_o, neg_o, mul_o, pow_o = [np.moveaxis(np.asarray(o), -1, 0) for o in run(ak, bk)]
    for i, (x, y) in enumerate(zip(vals_a, vals_b)):
        assert spec.from_mont_int(add_o[i]) == (x + y) % spec.N
        assert spec.from_mont_int(sub_o[i]) == (x - y) % spec.N
        assert spec.from_mont_int(neg_o[i]) == (-x) % spec.N
        assert spec.from_mont_int(mul_o[i]) == x * y % spec.N
        assert spec.from_mont_int(pow_o[i]) == pow(x, 5, spec.N)


def test_leading_axes_fold():
    """Extra leading dims (tower coeffs / MSM points) broadcast correctly."""
    spec = limb.FP_SPEC
    kf = KField(spec)
    rng = random.Random(12)
    vals = [[rng.randrange(spec.N) for _ in range(4)] for _ in range(3)]
    arr = np.stack([np.stack([spec.to_mont(v) for v in row]) for row in vals])
    ak = np.moveaxis(arr, 1, -1)  # (3, L, 4)
    out = np.asarray(jax.jit(kf.mont_mul)(ak, ak))
    for i in range(3):
        for j in range(4):
            got = spec.from_mont_int(out[i, :, j])
            assert got == vals[i][j] ** 2 % spec.N


def test_fp24_domain_roundtrip():
    """R25 <-> R24 Montgomery domain conversions are value-exact, including
    through a kernel-domain multiplication."""
    spec25 = limb.FP_SPEC
    rng = random.Random(14)
    vals = [rng.randrange(spec25.N) for _ in range(8)] + [0, spec25.N - 1]
    a25 = np.stack([spec25.to_mont(v) for v in vals])
    a24 = np.asarray(jax.jit(fp24_from_fp25)(a25))
    assert a24.shape[-1] == FP24_SPEC.L
    for i, v in enumerate(vals):
        assert FP24_SPEC.from_mont_int(a24[i]) == v
    back = np.asarray(jax.jit(fp25_from_fp24)(a24))
    for i, v in enumerate(vals):
        assert spec25.from_mont_int(back[i]) == v
    # multiply in the 24-limb kernel domain, convert back: value matches
    kf = KField(FP24_SPEC)
    ak = np.moveaxis(a24, 0, -1)  # (L24, B)
    prod25 = np.asarray(
        jax.jit(
            lambda p: fp25_from_fp24(jnp.moveaxis(kf.canon(kf.mont_mul(p, p)), -2, -1))
        )(ak)
    )  # (B, 25)
    for i, v in enumerate(vals):
        assert spec25.from_mont_int(prod25[i]) == v * v % spec25.N


def test_pow_kernel_interpret():
    """make_pow_kernel (dynamic-slice table ladder) in interpret mode, both
    specs, vs pow() on the host."""
    from plutus_halo2_tpu.ops.pallas_field import make_pow_kernel

    rng = random.Random(15)
    for (spec, e), width in (
        ((limb.FR_SPEC, limb.FR_SPEC.N - 2), 2),
        ((FP24_SPEC, 12345), 3),  # width 3: exercises the width-chunk padding
    ):
        B = 8
        vals = [[rng.randrange(1, spec.N) for _ in range(width)] for _ in range(B)]
        x = np.stack([np.stack([spec.to_mont(v) for v in row]) for row in vals])
        powk = make_pow_kernel(spec, e, width, lanes=B, interpret=True)
        out = np.asarray(powk(x))
        assert out.shape == (B, width, spec.L)
        for i in range(B):
            for j in range(width):
                assert spec.from_mont_int(out[i, j]) == pow(vals[i][j], e, spec.N)


def test_pallas_call_interpret_mul():
    from jax.experimental import pallas as pl

    spec = limb.FP_SPEC
    kf = KField(spec)
    rng = random.Random(13)
    B = 8
    vals_a, a = _rand_batch(spec, B, rng)
    vals_b, b = _rand_batch(spec, B, rng)
    ak = np.moveaxis(a, 0, -1)
    bk = np.moveaxis(b, 0, -1)

    def kernel(consts_ref, a_ref, b_ref, out_ref):
        f = kf.bind(consts_ref[:, :])
        out_ref[:, :] = f.mont_mul(a_ref[:, :], b_ref[:, :])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((spec.L, B), jnp.uint32),
        interpret=True,
    )(kf.const_args(), ak, bk)
    out = np.moveaxis(np.asarray(out), -1, 0)
    for i, (x, y) in enumerate(zip(vals_a, vals_b)):
        assert spec.from_mont_int(out[i]) == x * y % spec.N
