"""JAX G1 kernels vs the refimpl curve oracle: add/double/scalar-mul/MSM and
batched decompression (valid, invalid, infinity encodings)."""

import random
from functools import partial

import jax
import numpy as np
import pytest

from plutus_halo2_tpu.ops import curve as jc
from plutus_halo2_tpu.ops.limb import FR_SPEC
from plutus_halo2_tpu.refimpl import curve as rc
from plutus_halo2_tpu.refimpl.field import Q


def _host_points(k_list):
    return [rc.g1_mul(rc.G1_GEN, k) for k in k_list]


def _to_dev(points):
    return np.stack([jc.host_point_to_mont(p) for p in points])


@partial(jax.jit)
def _add(p, q):
    return jc.add(p, q)


@partial(jax.jit)
def _dbl(p):
    return jc.double(p)


@partial(jax.jit)
def _mul(p, s):
    return jc.mul(p, s)


@partial(jax.jit)
def _msm(p, s):
    return jc.msm(p, s)


@partial(jax.jit)
def _decompress(b):
    return jc.decompress(b)


def test_add_double_vs_ref():
    ks = [1, 2, 3, 5, 0xDEADBEEF, Q - 1]
    pts = _host_points(ks)
    a = _to_dev(pts)
    b = _to_dev(list(reversed(pts)))
    out = np.asarray(_add(a, b))
    for i, (p1, p2) in enumerate(zip(pts, reversed(pts))):
        assert jc.host_point_from_mont(out[i]) == rc.g1_add(p1, p2), f"row {i}"
    # identity + doubling rows
    ident = np.stack([jc.host_point_to_mont(None)] * len(pts))
    out = np.asarray(_add(a, ident))
    for i, p1 in enumerate(pts):
        assert jc.host_point_from_mont(out[i]) == p1
    out = np.asarray(_add(a, a))
    dbl = np.asarray(_dbl(a))
    for i, p1 in enumerate(pts):
        expect = rc.g1_add(p1, p1)
        assert jc.host_point_from_mont(out[i]) == expect
        assert jc.host_point_from_mont(dbl[i]) == expect


def test_scalar_mul_vs_ref():
    rng = random.Random(7)
    base_ks = [1, 3, 12345]
    scalars = [rng.randrange(Q) for _ in base_ks] + [0, 1, Q - 1]
    base_ks = base_ks + [5, 6, 7]
    pts = _host_points(base_ks)
    p_dev = _to_dev(pts)
    s_dev = np.stack([FR_SPEC.encode(s) for s in scalars])
    out = np.asarray(_mul(p_dev, s_dev))
    for i, (p, s) in enumerate(zip(pts, scalars)):
        assert jc.host_point_from_mont(out[i]) == rc.g1_mul(p, s), f"row {i}"


def test_msm_vs_ref():
    rng = random.Random(8)
    K = 7
    B = 3
    pts = [[rc.g1_mul(rc.G1_GEN, rng.randrange(1, 1000)) for _ in range(K)] for _ in range(B)]
    scl = [[rng.randrange(Q) for _ in range(K)] for _ in range(B)]
    p_dev = np.stack([_to_dev(row) for row in pts])
    s_dev = np.stack([np.stack([FR_SPEC.encode(s) for s in row]) for row in scl])
    out = np.asarray(_msm(p_dev, s_dev))
    for b in range(B):
        assert jc.host_point_from_mont(out[b]) == rc.g1_msm(scl[b], pts[b]), f"batch {b}"


def test_decompress_batch():
    cases = [
        ("97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb", rc.G1_GEN, True),
        ("b7f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb", rc.g1_neg(rc.G1_GEN), True),
        ("8ce3b57b791798433fd323753489cac9bca43b98deaafaed91f4cb010730ae1e38b186ccd37a09b8aed62ce23b699c48", rc.g1_mul(rc.G1_GEN, 42), True),
        ("c0" + "00" * 47, None, True),  # infinity
        ("17f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb", None, False),  # no compressed bit
        # x == p (field overflow -> reject deterministically)
        ("9a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffaaab", None, False),
    ]
    raw = np.stack([np.frombuffer(bytes.fromhex(h), dtype=np.uint8) for h, _, _ in cases])
    pts, valid = _decompress(raw)
    pts, valid = np.asarray(pts), np.asarray(valid)
    for i, (_h, expect, expect_valid) in enumerate(cases):
        assert bool(valid[i]) == expect_valid, f"validity row {i}"
        if expect_valid:
            assert jc.host_point_from_mont(pts[i]) == expect, f"point row {i}"


def test_decompress_proof_points():
    """All 12 points of the committed simple_mul proof decompress and land on
    the curve."""
    from plutus_halo2_tpu.utils import fixtures as fx

    proof = bytes.fromhex(fx.SIMPLE_MUL_PROOF_HEX)
    offsets = [0, 48, 96, 144, 192, 240, 288, 336]  # first 8 points
    raw = np.stack(
        [np.frombuffer(proof[o : o + 48], dtype=np.uint8) for o in offsets]
    )
    pts, valid = _decompress(raw)
    assert bool(np.all(np.asarray(valid)))
    a1 = jc.host_point_from_mont(np.asarray(pts)[0])
    assert a1 == fx.SIMPLE_MUL_A1_UNCOMPRESSED


def test_subgroup_check():
    """phi-based q-order membership: accepts cofactor-cleared points and the
    generator, rejects a raw E(Fp) point with a nonzero h-torsion component
    (the bls12_381_G1_uncompress builtin's subgroup semantics)."""
    from plutus_halo2_tpu.refimpl.field import P as FP

    h = 0x396C8C005555E1568C00AAAB0000AAAB  # G1 cofactor, (z-1)^2 / 3
    x = 100
    while True:
        rhs = (x**3 + 4) % FP
        y = pow(rhs, (FP + 1) >> 2, FP)
        if y * y % FP == rhs:
            raw = (x, y)
            break
        x += 1
    cleared = rc._mul(rc._FP_OPS, raw, h)
    batch = np.stack(
        [
            jc.host_point_to_mont(rc.G1_GEN),
            jc.host_point_to_mont(cleared),
            jc.host_point_to_mont(raw),
            jc.host_point_to_mont(None),  # identity is a member
        ]
    )
    out = np.asarray(jax.jit(jc.subgroup_check)(batch))
    assert out.tolist() == [True, True, False, True]


def test_decompress_y_hints():
    """Hinted decompression (2 Fp muls) matches the sqrt-ladder path exactly:
    either root works as a hint (sign logic normalizes), a non-root hint can
    only flip the verdict to reject, and invalid encodings stay rejected."""
    from plutus_halo2_tpu.ops.limb import FP_SPEC
    from plutus_halo2_tpu.refimpl.field import P as FP

    pts = [rc.G1_GEN, rc.g1_neg(rc.G1_GEN), rc.g1_mul(rc.G1_GEN, 42), None]
    raw = np.stack(
        [np.frombuffer(rc.g1_compress(p), dtype=np.uint8) for p in pts]
    )
    ref_pts, ref_valid = _decompress(raw)
    # hint = the "wrong" root (negated y) for finite points; zeros for inf
    hints = np.stack(
        [FP_SPEC.encode((-p[1]) % FP if p else 0) for p in pts]
    )
    h_pts, h_valid = jax.jit(lambda b, h: jc.decompress(b, y_hint=h))(raw, hints)
    assert np.asarray(h_valid).tolist() == np.asarray(ref_valid).tolist()
    assert np.array_equal(np.asarray(h_pts), np.asarray(ref_pts))

    # a non-root hint rejects (never accepts a different point)
    bad = hints.copy()
    bad[0] = FP_SPEC.encode(12345)
    b_pts, b_valid = jax.jit(lambda b, h: jc.decompress(b, y_hint=h))(raw, bad)
    assert np.asarray(b_valid).tolist() == [False, True, True, True]
