"""Pallas hinted-decompress kernel vs the XLA-path oracle
(ops/curve.decompress with y_hint): bit-identical points and valid flags on
honest encodings, sign-flag variants, infinity rows, x >= p rejects,
non-square x (wrong-hint) rejects, and corrupted hints."""

import numpy as np
import pytest

import jax

from plutus_halo2_tpu.ops import curve as jc
from plutus_halo2_tpu.ops.limb import FP_SPEC
from plutus_halo2_tpu.ops.pallas_curve import make_decompress_kernel
from plutus_halo2_tpu.refimpl import curve as rc
from plutus_halo2_tpu.refimpl.field import P


def _cases():
    """(48-byte encoding, hint int) rows covering the decision tree."""
    rows = []
    g = rc.G1_GEN
    for k in [1, 2, 3, 5, 7, 11]:
        p = rc.g1_mul(g, k)
        enc = rc.g1_compress(p)
        y = p[1]
        rows.append((enc, min(y, P - y)))  # canonical-root hint
        rows.append((enc, max(y, P - y)))  # other-root hint (sign normalizes)
    # infinity
    inf = bytes([0xC0] + [0] * 47)
    rows.append((inf, 0))
    # bad infinity (payload bits set)
    bad_inf = bytes([0xC0, 1] + [0] * 46)
    rows.append((bad_inf, 0))
    # x >= p: p + 2 is a valid 381-bit value above the modulus
    xbig = (P + 2).to_bytes(48, "big")
    rows.append((bytes([xbig[0] | 0x80]) + xbig[1:], 3))
    # non-square rhs: x = 1 -> rhs = 5, a quadratic non-residue hint can't fix
    x1 = (1).to_bytes(48, "big")
    rows.append((bytes([x1[0] | 0x80]) + x1[1:], 12345))
    # compressed flag missing
    p = rc.g1_mul(g, 13)
    enc = bytearray(rc.g1_compress(p))
    enc[0] &= 0x7F
    rows.append((bytes(enc), p[1]))
    # wrong hint for a good point
    p = rc.g1_mul(g, 17)
    rows.append((rc.g1_compress(p), p[1] + 1))
    return rows


def test_decompress_kernel_matches_xla_path():
    rows = _cases()
    K = 4
    B = 128
    # tile the case list into a (B, K) grid
    n = len(rows)
    raw = np.zeros((B, K, 48), np.uint8)
    hints = np.zeros((B, K, FP_SPEC.L), np.uint32)
    for b in range(B):
        for k in range(K):
            enc, hint = rows[(b * K + k) % n]
            raw[b, k] = np.frombuffer(enc, np.uint8)
            hints[b, k] = FP_SPEC.encode(hint % (1 << (16 * FP_SPEC.L)))

    ref_pts, ref_valid = jax.jit(lambda r, h: jc.decompress(r, y_hint=h))(
        raw, hints
    )
    kern = make_decompress_kernel(K, interpret=True)
    out_pts, out_valid = jax.jit(kern)(raw, hints)

    assert np.array_equal(np.asarray(ref_valid), np.asarray(out_valid))
    # some valid rows must exist, and some invalid (the case list covers both)
    v = np.asarray(ref_valid)
    assert v.any() and (~v).any()
    assert np.array_equal(np.asarray(ref_pts), np.asarray(out_pts)), (
        "kernel points must be bit-identical to the XLA path"
    )


@pytest.mark.slow
def test_decompress_kernel_fused_subgroup_parity():
    """The subgroup-fused variant must (a) keep points/valid bit-identical
    to the plain kernel, and (b) produce the same per-row aggregate verdicts
    as jc.aggregate_subgroup_check on the decompressed points — including a
    row whose encoding decodes to a NON-subgroup E(Fp) point and a row with
    an identity (infinity) encoding."""
    # a valid encoding of a point OUTSIDE G1 (nonzero h-torsion)
    x = 100
    while True:
        rhs = (x**3 + 4) % P
        y = pow(rhs, (P + 1) >> 2, P)
        if y * y % P == rhs and not rc.g1_in_subgroup((x, y)):
            evil = (x, y)
            break
        x += 1
    g = [rc.g1_mul(rc.G1_GEN, 3 + i) for i in range(3)]
    K, B = 4, 128
    rows = [
        [g[0], g[1], g[2], None],  # honest, with an infinity encoding
        [g[0], evil, g[2], g[1]],  # contains a non-subgroup point
        [None, None, None, None],  # all-infinity
        [g[2], g[0], g[1], g[1]],  # honest
    ]
    raw = np.zeros((B, K, 48), np.uint8)
    hints = np.zeros((B, K, FP_SPEC.L), np.uint32)
    for b in range(B):
        row = rows[b % len(rows)]
        for k, pt in enumerate(row):
            enc = rc.g1_compress(pt)
            raw[b, k] = np.frombuffer(enc, np.uint8)
            hints[b, k] = FP_SPEC.encode(pt[1] if pt is not None else 0)
    from plutus_halo2_tpu.ops import curve as jcv

    w = jcv.subgroup_weights(K, rounds=2, rng=np.random.default_rng(11))
    plain = make_decompress_kernel(K, interpret=True)
    fused = make_decompress_kernel(K, interpret=True, subgroup_rounds=2)
    p_pts, p_valid = jax.jit(plain)(raw, hints)
    f_pts, f_valid, f_sub = jax.jit(lambda r, h: fused(r, h, w))(raw, hints)
    assert np.array_equal(np.asarray(p_pts), np.asarray(f_pts))
    assert np.array_equal(np.asarray(p_valid), np.asarray(f_valid))
    ref_sub = np.asarray(jcv.aggregate_subgroup_check(p_pts, w))
    assert np.array_equal(np.asarray(f_sub), ref_sub)
    expect = [True, False, True, True]
    assert np.asarray(f_sub)[: len(expect)].tolist() == expect


def test_decompress_kernel_oversized_hint_soundness():
    """Hints are untrusted: the kernel reads a hint mod 2^384 (low 24
    limbs), so an adversarial top limb reinterprets — never weakens — the
    hint. A row may only accept when the truncated hint is a GENUINE square
    root (then the decoded point is the true point); a truncated non-root
    rejects. Either way acceptance of a wrong point is impossible."""
    p = rc.g1_mul(rc.G1_GEN, 23)
    enc = np.frombuffer(rc.g1_compress(p), np.uint8)
    K, B = 2, 128
    raw = np.broadcast_to(enc, (B, K, 48)).copy()
    hints = np.zeros((B, K, FP_SPEC.L), np.uint32)
    # point 0: correct hint + junk top limb -> truncates to the true root:
    # accept, and the decoded point must be the TRUE point
    hints[:, 0, :] = FP_SPEC.encode(p[1])
    hints[:, 0, 24] = 7
    # point 1: wrong hint + junk top limb -> truncates to a non-root: reject
    hints[:, 1, :] = FP_SPEC.encode(p[1] + 1)
    hints[:, 1, 24] = 7
    kern = make_decompress_kernel(K, interpret=True)
    pts, valid = jax.jit(kern)(raw, hints)
    valid = np.asarray(valid)
    assert valid[:, 0].all()
    assert not valid[:, 1].any()
    true_pt = jc.host_point_to_mont(p)
    assert np.array_equal(np.asarray(pts)[0, 0], true_pt)
