"""Limb field arithmetic vs the refimpl oracle: randomized bit-exact checks
for add/sub/neg/mul/pow/inv/conversions on both Fr and Fp. All ops run jitted
(eager dispatch over the TPU tunnel is impractically slow; jit is also the
only mode the verifier uses)."""

import random
from functools import partial

import jax
import numpy as np
import pytest

from plutus_halo2_tpu.ops import limb


@partial(jax.jit, static_argnums=0)
def _add(spec, a, b):
    return limb.add(spec, a, b)


@partial(jax.jit, static_argnums=0)
def _sub(spec, a, b):
    return limb.sub(spec, a, b)


@partial(jax.jit, static_argnums=0)
def _neg(spec, a):
    return limb.neg(spec, a)


@partial(jax.jit, static_argnums=0)
def _mul(spec, a, b):
    return limb.mont_mul(spec, a, b)


@partial(jax.jit, static_argnums=(0, 2))
def _pow(spec, a, e):
    return limb.mont_pow_static(spec, a, e)


@partial(jax.jit, static_argnums=0)
def _to_from(spec, a):
    return limb.from_mont(spec, limb.to_mont(spec, a))


def _rand_elems(spec, count, rng):
    return [rng.randrange(spec.N) for _ in range(count)]


@pytest.mark.parametrize("spec", [limb.FR_SPEC, limb.FP_SPEC], ids=["fr", "fp"])
def test_roundtrip_encoding(spec):
    rng = random.Random(1)
    for x in _rand_elems(spec, 5, rng) + [0, 1, spec.N - 1]:
        assert limb.limbs_to_int(spec.encode(x)) == x
        assert spec.from_mont_int(spec.to_mont(x)) == x


@pytest.mark.parametrize("spec", [limb.FR_SPEC, limb.FP_SPEC], ids=["fr", "fp"])
def test_add_sub_neg(spec):
    rng = random.Random(2)
    vals_a = _rand_elems(spec, 64, rng) + [0, spec.N - 1]
    vals_b = _rand_elems(spec, 64, rng) + [spec.N - 1, 0]
    xs = np.stack([spec.encode(v) for v in vals_a])
    ys = np.stack([spec.encode(v) for v in vals_b])
    s = np.asarray(_add(spec, xs, ys))
    d = np.asarray(_sub(spec, xs, ys))
    n = np.asarray(_neg(spec, xs))
    for i, (a, b) in enumerate(zip(vals_a, vals_b)):
        assert limb.limbs_to_int(s[i]) == (a + b) % spec.N, f"add row {i}"
        assert limb.limbs_to_int(d[i]) == (a - b) % spec.N, f"sub row {i}"
        assert limb.limbs_to_int(n[i]) == (-a) % spec.N, f"neg row {i}"


@pytest.mark.parametrize("spec", [limb.FR_SPEC, limb.FP_SPEC], ids=["fr", "fp"])
def test_mont_mul(spec):
    rng = random.Random(3)
    vals_a = _rand_elems(spec, 64, rng) + [0, 1, spec.N - 1, spec.N - 1]
    vals_b = _rand_elems(spec, 64, rng) + [spec.N - 1, 1, spec.N - 1, 0]
    xs = np.stack([spec.to_mont(v) for v in vals_a])
    ys = np.stack([spec.to_mont(v) for v in vals_b])
    prod = np.asarray(_mul(spec, xs, ys))
    for i, (a, b) in enumerate(zip(vals_a, vals_b)):
        assert spec.from_mont_int(prod[i]) == a * b % spec.N, f"mul row {i}"


@pytest.mark.parametrize("spec", [limb.FR_SPEC, limb.FP_SPEC], ids=["fr", "fp"])
def test_pow_and_inv(spec):
    rng = random.Random(4)
    vals = _rand_elems(spec, 4, rng)
    xs = np.stack([spec.to_mont(v) for v in vals])
    cube = np.asarray(_pow(spec, xs, 3))
    for i, v in enumerate(vals):
        assert spec.from_mont_int(cube[i]) == pow(v, 3, spec.N)
    inv = np.asarray(_pow(spec, xs, spec.N - 2))
    for i, v in enumerate(vals):
        assert spec.from_mont_int(inv[i]) == pow(v, spec.N - 2, spec.N)


def test_to_from_mont_device():
    spec = limb.FR_SPEC
    rng = random.Random(5)
    vals = _rand_elems(spec, 8, rng)
    xs = np.stack([spec.encode(v) for v in vals])
    back = np.asarray(_to_from(spec, xs))
    for i, v in enumerate(vals):
        assert limb.limbs_to_int(back[i]) == v
